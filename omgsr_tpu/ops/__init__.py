from omgsr_tpu.ops.attention import dot_product_attention
from omgsr_tpu.ops.color import adain_color_fix, wavelet_color_fix
from omgsr_tpu.ops.diffjpeg import diffjpeg
from omgsr_tpu.ops.filters import filter2d, usm_sharp
from omgsr_tpu.ops.ms_deform_attn import ms_deform_attn
from omgsr_tpu.ops.noise import add_gaussian_noise, add_poisson_noise
from omgsr_tpu.ops.resize import resize, resize_by_scale
