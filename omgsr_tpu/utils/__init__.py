from omgsr_tpu.utils.dtypes import DTYPE_MAP, resolve_dtype
from omgsr_tpu.utils.tree import (
    tree_path_str,
    tree_map_with_path_str,
    flatten_dict,
    unflatten_dict,
)
