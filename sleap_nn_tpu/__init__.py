"""sleap_nn_tpu: TPU-native animal pose estimation engine (JAX/XLA/Pallas).

A from-scratch rebuild of the capabilities of SLEAP-NN (the PyTorch engine
behind SLEAP) designed TPU-first: flax models compiled under XLA, device-side
fused preprocessing + target rendering, Pallas/XLA post-processing kernels,
and pjit/`shard_map` data parallelism over a `jax.sharding.Mesh`.

Reference behavior parity targets are cited per-module as
``reference: sleap_nn/<file>:<line>`` (see /root/repo/SURVEY.md).
"""

from __future__ import annotations

import os

__version__ = "0.1.0"

# Process rank for multi-host runs. Mirrors the reference's LOCAL_RANK
# convention (reference: sleap_nn/__init__.py:8) but sourced from JAX's
# process index when the distributed runtime is initialized.
RANK = int(os.environ.get("LOCAL_RANK", os.environ.get("JAX_PROCESS_INDEX", 0)))


def process_rank() -> int:
    """Return the current process index (0 on single-host)."""
    try:
        import jax

        return jax.process_index()
    except Exception:
        return RANK


# -- lazy top-level public API (reference sleap_nn/__init__.py contract:
#    sleap_nn.{predict, Predictor, load_models}; tests/test_public_api.py).
#    Lazy so `import sleap_nn_tpu` stays cheap (no jax/flax import).

__all__ = ["RANK", "Predictor", "__version__", "load_models", "predict",
           "process_rank"]


def load_models(model_paths, **kwargs):
    """Build a :class:`Predictor` from trained model dir(s).

    Thin forwarding wrapper over ``Predictor.from_model_paths`` (the
    reference's ``sleap_nn.load_models``).
    """
    from sleap_nn_tpu.inference import Predictor as _P

    return _P.from_model_paths(model_paths, **kwargs)


def __getattr__(name: str):
    if name == "predict":
        from sleap_nn_tpu.inference import predict as _predict

        return _predict
    if name == "Predictor":
        from sleap_nn_tpu.inference import Predictor as _Predictor

        return _Predictor
    raise AttributeError(f"module 'sleap_nn_tpu' has no attribute {name!r}")
