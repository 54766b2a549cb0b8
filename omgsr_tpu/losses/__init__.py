from omgsr_tpu.losses.dists import dists_loss, init_dists
from omgsr_tpu.losses.discriminator import (
    init_discriminator,
    discriminator_loss,
    disc_param_labels,
)
from omgsr_tpu.losses.diffaug import diff_augment
