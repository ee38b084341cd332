"""radar-camera-fusion-depth_tpu: TPU-native (JAX/XLA/Pallas/pjit) framework
with the capabilities of nesl/radar-camera-fusion-depth (CVPR 2023)."""

__version__ = '0.1.0'


def _maybe_enable_compilation_cache():
    """Opt-in persistent XLA compilation cache (RCFD_COMPILE_CACHE=dir).

    The serving graph's first compile is expensive through a remote
    compile service (the take-based pool window gather alone costs
    ~17 min, docs/PERF.md round-3b); the persistent cache amortizes it
    to one compile per (graph, config) across processes. Opt-in because
    executable serialization support varies by PJRT backend — if the
    backend rejects it, JAX falls back to compiling (warning, no error).
    """
    import os
    cache_dir = os.environ.get('RCFD_COMPILE_CACHE')
    if not cache_dir:
        return
    import jax
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs',
                      float(os.environ.get('RCFD_COMPILE_CACHE_MIN_SECS',
                                           '10')))


_maybe_enable_compilation_cache()
