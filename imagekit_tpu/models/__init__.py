"""Transform-pipeline "model" registry.

The framework's model families are its codec pipelines — the analogue of
the reference's per-format encoder arms (``src/transform.rs:113-150``) and
format matrix (BASELINE config #2). Each pipeline declares which stages run
on device vs host and which backend finishes the bitstream.
"""

from imagekit_tpu.models.pipelines import (  # noqa: F401
    PIPELINES,
    Pipeline,
    Stage,
    get_pipeline,
)
