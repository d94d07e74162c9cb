"""cnn_gp_tpu: TPU-native NNGP kernels for convolutional architectures.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
``cnn_gp`` package ("Deep Convolutional Networks as shallow Gaussian
Processes", Garriga-Alonso et al., ICLR 2019): exact covariance kernels of
infinitely-wide CNNs, blockwise Gram assembly, GP classification, and
finite-width Monte-Carlo validation -- redesigned for TPU meshes.
"""

import os as _os

# Honour JAX_PLATFORMS / JAX_COMPILATION_CACHE_DIR even where a
# sitecustomize pre-imports jax and freezes env-derived config before user
# code runs (see tests/conftest.py).
def _reapply_env_config():
    import jax
    for env, key in (("JAX_PLATFORMS", "jax_platforms"),
                     ("JAX_COMPILATION_CACHE_DIR",
                      "jax_compilation_cache_dir")):
        if env in _os.environ:
            try:  # independent: one failing update must not skip the rest
                jax.config.update(key, _os.environ[env])
            except Exception:  # pragma: no cover - best effort
                pass
    # Default-on persistent compilation cache: on remote-compile runtimes
    # a cold ResNet-32 kernel program costs 1-3 minutes to compile per
    # process; the cache cuts repeat processes to seconds (measured
    # 87s -> 13s).  An explicit JAX_COMPILATION_CACHE_DIR (above) wins.
    _apply_default_cache_dir()


_CACHE_ROOT = _os.path.expanduser("~/.cache/cnn_gp_tpu/jax-")


def _apply_default_cache_dir():
    """Key the default compilation cache per *resolved* platform.

    One cache per platform: remote-compile runtimes may produce host-AOT
    artifacts for a different CPU than this machine's, and a shared dir
    would let local CPU runs load them (SIGILL risk).  Keys on the live
    ``jax_platforms`` config (which reflects runtime
    ``jax.config.update`` flips — the sitecustomize freezes the env var,
    see ``use_platform``), not on the env var alone.  A user-set
    JAX_COMPILATION_CACHE_DIR (env) or an explicit non-default config
    value is never overridden.
    """
    if "JAX_COMPILATION_CACHE_DIR" in _os.environ:
        return
    import jax
    try:
        current = jax.config.jax_compilation_cache_dir
        if current and not current.startswith(_CACHE_ROOT):
            return                      # explicit user config: keep it
        plat = (getattr(jax.config, "jax_platforms", None)
                or _os.environ.get("JAX_PLATFORMS"))
        if plat is None:
            # Platform unresolved: keying a cache dir "auto" could mix
            # artifacts across whatever backend jax later picks (including
            # CPU, whose host-AOT gating below would be bypassed).
            # Resolving via jax.default_backend() here would force backend
            # initialisation at import time, so just run cache-less; an
            # explicit JAX_PLATFORMS / use_platform() opts back in.
            if current:
                jax.config.update("jax_compilation_cache_dir", "")
            return
        if plat == "cpu":
            # no default cache for pure-CPU runs: on remote-compile
            # runtimes even XLA:CPU programs can come back as AOT
            # artifacts for the *service* machine's CPU (observed:
            # feature-mismatch load warnings, SIGILL risk), and local CPU
            # compiles are fast anyway.  Opt in via the env var if wanted.
            if current:
                jax.config.update("jax_compilation_cache_dir", "")
            return
        jax.config.update("jax_compilation_cache_dir", _CACHE_ROOT + plat)
    except Exception:  # pragma: no cover - best effort
        pass


def use_platform(platform: str) -> None:
    """Switch the jax backend at runtime and re-key the compilation cache.

    This environment's sitecustomize pre-imports jax and freezes
    env-derived config, so ``JAX_PLATFORMS=cpu python ...`` does nothing
    after the fact; the supported flip is
    ``jax.config.update("jax_platforms", ...)`` plus dropping any
    already-initialized backend.  Doing that alone would leave the
    per-platform default compilation cache keyed to the *old* platform
    and mix artifacts across platforms — this helper does both.
    """
    import jax
    # Always drop any initialized backend: the config string can already
    # read `platform` (e.g. re-applied from the env var at import) while
    # the live backend is still the frozen pre-import one.
    try:
        import jax.extend
        jax.extend.backend.clear_backends()
    except Exception:  # pragma: no cover - not initialized yet
        pass
    jax.config.update("jax_platforms", platform)
    # JAX's persistent cache initialises at most once per process
    # (guarded by _cache_initialized, and jax_compilation_cache_dir has
    # no update hook): if anything compiled before this flip, the OLD
    # platform's cache dir — or the disabled-'' state — would silently
    # stay live.  reset_cache() drops that state so the re-keyed dir (or
    # the cpu "off" state) actually takes effect.
    try:
        from jax.experimental.compilation_cache import (
            compilation_cache as _cc)
        _cc.reset_cache()
    except Exception:  # pragma: no cover - best effort
        pass
    _apply_default_cache_dir()


_reapply_env_config()

from .kernel_patch import KernelPatch
from .kernels import (NNGPKernel, Conv2d, ReLU, Sequential, Sum, Mixture,
                      resnet_block, kernel_fn, input_patch)
from .finite import FiniteNet, sample_nn_outputs
from . import settings
from . import fit as fit_lib
from .fit import fit, neg_marginal_log_likelihood

# Reference-parity top-level surface (the reference package star-exports
# its data/save tooling too, reference: cnn_gp/__init__.py:1-6)
from .data import (DatasetFromConfig, ProductIterator, DiagIterator,
                   GramStore, open_store)
from .parallel import save_K
from .utils import print_timings

__all__ = [
    "KernelPatch", "NNGPKernel", "Conv2d", "ReLU", "Sequential", "Sum",
    "Mixture", "resnet_block", "kernel_fn", "input_patch", "FiniteNet",
    "sample_nn_outputs", "settings", "fit", "neg_marginal_log_likelihood",
    "DatasetFromConfig", "ProductIterator", "DiagIterator", "GramStore",
    "open_store", "save_K", "print_timings", "use_platform",
]

__version__ = "0.1.0"
