"""vltk_tpu — a TPU-native vision-language data + extraction + training framework.

Working import surface mirrors the reference (reference: vltk/__init__.py:3-13):
adapters, configs, builder, features, processors, vars — everything a user
needs to go raw-dataset -> arrow -> device batches -> model.

    import vltk_tpu as vltk
    train_loader, eval_loader = vltk.build(config)
"""

from vltk_tpu.vars import *  # noqa: F401,F403 — canonical keys (vltk.imgid, ...)
from vltk_tpu import vars  # noqa: F401
from vltk_tpu.config import (  # noqa: F401
    Config,
    DataConfig,
    EvalConfig,
    LangConfig,
    MeshConfig,
    ModelConfig,
    ModelsConfig,
    TrainConfig,
    VisionConfig,
)
from vltk_tpu.features import Features  # noqa: F401

# The `features` *submodule* import shadows the canonical key string
# ``vars.features``; user code reads ``vltk.features`` as the column name
# (reference usage), so rebind the string. ``from vltk_tpu.features import
# Features`` still resolves through sys.modules.
features = vars.features

__version__ = "0.1.0"


def build(config):
    """One config -> (train_loader, eval_loader)
    (reference: vltk/__init__.py:16-17)."""
    from vltk_tpu.data.builder import init_datasets

    return init_datasets(config)


def __getattr__(name):
    # lazy heavyweight namespaces
    if name == "adapters":
        import vltk_tpu.adapters as adapters

        return adapters
    if name == "Adapters":
        from vltk_tpu.adapters import Adapters

        return Adapters
    if name == "processing":
        import vltk_tpu.processing as processing

        return processing
    if name == "Processors":
        from vltk_tpu.processing import Processors

        return Processors
    # subclassing ABCs, importable from the package root exactly like the
    # reference (vltk/__init__.py:3-12) so `from vltk import VisnDataset`
    # ports as `from vltk_tpu import VisnDataset`
    if name == "VisnDataset":
        from vltk_tpu.adapters.visn import VisnDataset

        return VisnDataset
    if name == "VisnLangDataset":
        from vltk_tpu.adapters.visnlang import VisnLangDataset

        return VisnLangDataset
    if name == "VisnExtraction":
        from vltk_tpu.adapters.extraction import VisnExtraction

        return VisnExtraction
    if name in ("VisnProcessor", "LangProcessor", "VisnLangProcessor"):
        from vltk_tpu.processing import processor as _proc

        return getattr(_proc, name)
    if name == "VQAPredictor":
        from vltk_tpu.predict import VQAPredictor

        return VQAPredictor
    if name == "DocTokenClassifier":
        from vltk_tpu.predict import DocTokenClassifier

        return DocTokenClassifier
    if name == "DocSpanQA":
        from vltk_tpu.predict import DocSpanQA

        return DocSpanQA
    if name == "aot":
        import vltk_tpu.aot as aot

        return aot
    if name == "serving":
        import vltk_tpu.serving as serving

        return serving
    if name == "MicroBatchServer":
        from vltk_tpu.serving import MicroBatchServer

        return MicroBatchServer
    raise AttributeError(f"module 'vltk_tpu' has no attribute {name!r}")
