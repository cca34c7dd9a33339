"""Serving-side components: dynamic micro-batching over the device store."""

from lattice_tpu.serving.frontend import BatchingFrontend, FrontendStats

__all__ = ["BatchingFrontend", "FrontendStats"]
