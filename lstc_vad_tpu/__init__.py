"""lstc_vad_tpu — a TPU-native JAX framework for weakly supervised video anomaly
detection with the capabilities of LSTC (Long-Short Temporal Co-Teaching, ICME 2023).

The framework re-implements, TPU-first, everything the PyTorch reference
(shengyangsun/LSTC_VAD) provides:

- ``models``      — Flax transformer encoder (STN/LTN) + Regressor/Classifier heads,
                    with 3-D/2-D Swin-video relative position bias.
- ``ops``         — attention compute paths (pure-XLA and fused Pallas TPU kernel).
- ``objectives``  — MIL ranking hinge, soft cross-entropy on probabilities,
                    class-weighted BCE — vectorized, jit-friendly.
- ``data``        — annotation parsers, HDF5/packed feature stores, the
                    linspace+jitter snippet sampler, balanced pair batching,
                    background prefetch.
- ``train``       — jitted/pjit train steps (Adagrad, two LR groups, grad clip)
                    and the STN/LTN training drivers.
- ``evaluation``  — frame-level AUC pipeline (part chunking with tail re-window,
                    UCF 32-bin compression + L2 norm) and the numpy metric zoo.
- ``pseudo``      — on-device pseudo-label generators and the co-teaching driver.
- ``parallel``    — device mesh / sharding helpers (DP x TP over ICI).
- ``ckpt``        — Orbax checkpointing + PyTorch state_dict importer/exporter.
- ``export``      — AOT deployment artifacts (jax.export StableHLO + params);
                    offline eval and online serving run from them without
                    model code.
- ``serving``     — online multi-stream scorer (live params or AOT artifact).
"""

__version__ = "0.1.0"

from .config import (  # noqa: E402,F401
    DataConfig,
    EncoderConfig,
    HeadConfig,
    LossConfig,
    OptimConfig,
    TrainConfig,
    preset,
    replace,
)


def __getattr__(name):
    """Lazy heavyweight imports so `import lstc_vad_tpu` stays instant."""
    lazy = {
        "Encoder": ("lstc_vad_tpu.models", "Encoder"),
        "Classifier": ("lstc_vad_tpu.models", "Classifier"),
        "Regressor": ("lstc_vad_tpu.models", "Regressor"),
        "make_head": ("lstc_vad_tpu.models", "make_head"),
        "Trainer": ("lstc_vad_tpu.train.driver", "Trainer"),
        "CoTeachingDriver": ("lstc_vad_tpu.pseudo", "CoTeachingDriver"),
        "StreamingScorer": ("lstc_vad_tpu.serving", "StreamingScorer"),
        "save_scorer_artifact": ("lstc_vad_tpu.export",
                                 "save_scorer_artifact"),
        "load_scorer": ("lstc_vad_tpu.export", "load_scorer"),
        "validate_data": ("lstc_vad_tpu.data.validate", "validate_data"),
    }
    if name in lazy:
        import importlib

        module, attr = lazy[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'lstc_vad_tpu' has no attribute {name!r}")
