from omgsr_tpu.serving.server import ServeOptions, SRServer

__all__ = ["SRServer", "ServeOptions"]
