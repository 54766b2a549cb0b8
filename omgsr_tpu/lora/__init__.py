from omgsr_tpu.lora.lora import (
    SD_TARGET_MODULES,
    FLUX_TARGET_MODULES,
    path_matches_targets,
    init_lora_tree,
    attach_lora,
    split_lora,
    merge_lora,
    stack_lora_tree,
    unstack_lora_tree,
    lora_param_count,
)
from omgsr_tpu.lora.adapter_io import save_adapter, load_adapter, import_peft_adapter
