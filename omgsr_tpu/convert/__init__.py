from omgsr_tpu.convert.porters import (
    load_safetensors_dir,
    port_diffusers_vae,
    port_diffusers_unet,
    port_flux_transformer,
    port_clip_text,
    port_t5_encoder,
    port_dinov3_convnext,
    port_dinov3_vit,
)
