"""Compatibility alias: the framework's importable name is
``imagekit_tpu`` (the reference service calls itself "imagekit" —
SURVEY.md); this package mirrors it under the repo-derived name so both
``import imagekit_tpu`` and ``import rust_image_transform_tpu`` work,
including submodules (``rust_image_transform_tpu.ops.resize`` etc.)."""

import importlib
import sys

import imagekit_tpu as _pkg

sys.modules[__name__] = _pkg

# eagerly alias the subpackages so `import rust_image_transform_tpu.ops`
# style imports resolve
for _sub in (
    "ops",
    "ops.resize",
    "ops.dct",
    "ops.pallas",
    "ops.pallas.resize_kernel",
    "parallel",
    "parallel.mesh",
    "parallel.sharding",
    "parallel.tiling",
    "utils",
    "utils.bucketing",
    "models",
    "models.pipelines",
    "cache",
    "codecs",
    "serving",
    "config",
    "signature",
    "transform",
    "fetch",
    "errors",
):
    try:
        sys.modules[f"{__name__}.{_sub}"] = importlib.import_module(
            f"imagekit_tpu.{_sub}"
        )
    except ImportError:
        pass
