from omgsr_tpu.ops.attention import dot_product_attention
