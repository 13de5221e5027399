"""styletts_zs_tpu — TPU-native zero-shot TTS framework (JAX/XLA/Pallas).

Public API:
    Config / load_config      configuration system (utils.config)
    Synthesizer               zero-shot inference (pipelines.infer)
    init_params               parameter initialization (pipelines.factory)
    Stage1Trainer/2/3         training pipelines (pipelines.train)
    Server                    length-bucketed serving (pipelines.serve)
"""

__version__ = "0.1.0"

# Lazy re-exports: keep `import styletts_zs_tpu` light (no jax import cost
# until a symbol is touched).
_EXPORTS = {
    "Config": ("styletts_zs_tpu.utils.config", "Config"),
    "load_config": ("styletts_zs_tpu.utils.config", "load_config"),
    "Synthesizer": ("styletts_zs_tpu.pipelines.infer", "Synthesizer"),
    "init_params": ("styletts_zs_tpu.pipelines.factory", "init_params"),
    "Stage1Trainer": ("styletts_zs_tpu.pipelines.train", "Stage1Trainer"),
    "Stage2Trainer": ("styletts_zs_tpu.pipelines.train", "Stage2Trainer"),
    "Stage3Trainer": ("styletts_zs_tpu.pipelines.train", "Stage3Trainer"),
    "Server": ("styletts_zs_tpu.pipelines.serve", "Server"),
}


def __getattr__(name):
    if name in _EXPORTS:
        import importlib
        mod, attr = _EXPORTS[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'styletts_zs_tpu' has no attribute {name!r}")


__all__ = list(_EXPORTS) + ["__version__"]
