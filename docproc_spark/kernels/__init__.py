"""Pure pandas/numpy kernels — unit-testable without a SparkSession.

Each kernel has a scalar form (used by the single-process oracle) and a
vectorized pandas form (used inside pandas UDFs / mapInPandas on the
cluster). Tests assert the two forms agree on every fixture.
"""

from docproc_spark.kernels.sanitize import (  # noqa: F401
    sanitize_text,
    sanitize_series,
    boilerplate_kind,
    boilerplate_kind_series,
    DROP_KINDS_DEFAULT,
)
from docproc_spark.kernels.captions import caption_stub, caption_series  # noqa: F401
from docproc_spark.kernels.assembly import assemble_document  # noqa: F401
from docproc_spark.kernels.html import html_main_blocks  # noqa: F401
