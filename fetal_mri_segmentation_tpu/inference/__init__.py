"""Inference package — lazy re-exports (PEP 562).

The submodules split by import weight: ``labelmaps`` is pure numpy so
host-only tooling (tools/ensemble.py, evaluation on accelerator-less
machines) can import it without paying the jax/model stack that
``sliding_window``/``predict`` pull in. The package therefore must not
import those eagerly; attribute access resolves them on first use, so
``from fetal_mri_segmentation_tpu.inference import predict_case`` keeps
working unchanged.
"""

_EXPORTS = {
    "SlidingWindowPredictor": "sliding_window",
    "patch_wise_prediction": "sliding_window",
    "run_validation_cases": "predict",
    "run_validation_case": "predict",
    "predict_case": "predict",
    "resolve_case_files": "predict",
    # numpy-only (inference.labelmaps; re-exported by predict too)
    "prediction_to_image": "labelmaps",
    "get_prediction_labels": "labelmaps",
}

__all__ = list(_EXPORTS)


def __getattr__(name):
    if name in _EXPORTS:
        import importlib
        mod = importlib.import_module(
            f"fetal_mri_segmentation_tpu.inference.{_EXPORTS[name]}")
        return getattr(mod, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
