"""moss_tpu: a TPU-native (JAX/XLA/Pallas) framework for motion-aware 3D Gaussian
splatting of clothed humans from monocular video.

Re-designed from scratch for TPU with the capabilities of the reference
3DHumanRehab/MOSS pipeline (see SURVEY.md at the repo root): a canonical Gaussian
cloud anchored to an SMPL body is deformed per frame by LBS with two learned
correction networks, rasterized by a differentiable tile-based splatting kernel,
and optimized against monocular video with L1/mask/SSIM/LPIPS/S3IM/Fisher-NLL
losses, with motion-aware (Fisher-rotation) densification.

Layout:
  ops/       pure-jnp math + Pallas TPU kernels (SH, projection, rasterize, KNN, losses)
  models/    Gaussian parameter pytree, SMPL body model, deformation, correction MLPs
  render/    camera model and the full differentiable render function
  train/     losses, optimizer, densification, train step, checkpointing
  data/      dataset readers (ZJU-MoCap-Refine, MonoCap, DNA-rendering) + synthetic fixtures
  parallel/  mesh/sharding for multi-chip training (tile-sharded pixels, replicated cloud)
  native/    C++ host-side helpers (PLY IO, spatial KNN, mask raster) with numpy fallback
"""

__version__ = "0.1.0"


def enable_compilation_cache(path: str = None) -> None:
    """Turn on JAX's persistent compilation cache (idempotent).

    The fused train-step program takes minutes to build on a remote TPU; the
    reference amortizes nothing (CUDA kernels are precompiled), so this is the
    TPU-native equivalent of shipping compiled kernels. Trainer/bench/driver
    entry points call this; MOSS_COMPILE_CACHE overrides the location, or set
    it to "0" to disable.
    """
    import os

    env = os.environ.get("MOSS_COMPILE_CACHE", "")
    if env == "0":
        return
    path = env or path or "/tmp/moss_jax_cache"
    import jax

    try:
        if jax.config.jax_compilation_cache_dir == path:
            return
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
