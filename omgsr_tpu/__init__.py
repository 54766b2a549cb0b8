"""omgsr-tpu: TPU-native one-step diffusion super-resolution framework.

A ground-up JAX/XLA/Pallas/pjit implementation of the capabilities of
wuer5/OMGSR ("One Mid-timestep Guidance Super-Resolution"): real-world image
SR that runs a pretrained latent diffusion model for exactly one denoising
step at an SNR-calibrated mid timestep.

Two model families:
  * OMGSR-S: Stable Diffusion 2.1-base UNet (epsilon prediction, DDPM
    schedule), 512-px processing, mid-timestep 273.
  * OMGSR-F: FLUX.1-dev DiT (velocity prediction, resolution-shifted
    flow-matching schedule), 1024-px processing, mid-timestep 244.

See SURVEY.md for the structural map of the reference this framework
re-implements TPU-first (reference: /root/reference, cited as file:line in
docstrings throughout).
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy convenience exports (keep bare `import omgsr_tpu` light)."""
    if name == "OMGSRSPipeline":
        from omgsr_tpu.inference.pipeline_s import OMGSRSPipeline

        return OMGSRSPipeline
    if name == "OMGSRFPipeline":
        from omgsr_tpu.inference.pipeline_f import OMGSRFPipeline

        return OMGSRFPipeline
    if name == "TrainConfig":
        from omgsr_tpu.config import TrainConfig

        return TrainConfig
    if name == "load_config":
        from omgsr_tpu.config import load_config

        return load_config
    if name == "hub":
        import omgsr_tpu.hub as hub

        return hub
    raise AttributeError(f"module 'omgsr_tpu' has no attribute {name!r}")
