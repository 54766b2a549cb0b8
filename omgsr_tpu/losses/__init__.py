from omgsr_tpu.losses.dists import dists_loss, init_dists
from omgsr_tpu.losses.discriminator import (
    init_discriminator,
    discriminator_loss,
    disc_param_labels,
)
from omgsr_tpu.losses.diffaug import diff_augment
from omgsr_tpu.losses.ssl import (
    dino_loss,
    dino_softmax_center_teacher,
    dino_update_center,
    sinkhorn_knopp,
    ibot_patch_loss,
    ibot_softmax_center_teacher,
    ibot_update_center,
    koleo_loss,
    gram_loss,
)
