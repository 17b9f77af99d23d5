"""Model layer: config-driven Flax detectors over a fixed-shape batch_dict.

Parity surface: ``pcdet/models/__init__.py`` (build_network :16-20,
model_fn_decorator :37-52) — but TPU-first: the detector is a pure
``apply(variables, batch, training) → batch_dict`` function; there is no
``load_data_to_gpu`` (device placement is the train loop's job via
``jax.device_put`` / sharding).
"""

from .detectors import build_detector


def build_network(model_cfg, num_class, dataset):
    """Build a detector Flax module (parity: ``pcdet/models/build_network``)."""
    return build_detector(model_cfg=model_cfg, num_class=num_class, dataset=dataset)
