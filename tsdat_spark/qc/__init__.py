"""QC algebra: checkers produce boolean failure-mask Columns, handlers are
DataFrame stages consuming them (tsdat ``tsdat/qc`` re-expressed)."""

from .checkers import (  # noqa: F401
    QCContext,
    check_delta,
    check_mask_threshold,
    check_max,
    check_min,
    check_missing,
    check_monotonic,
    check_std,
)
from .handlers import (  # noqa: F401
    DataQualityError,
    cubic_spline_interp,
    fail_pipeline,
    record_quality_results,
    remove_failed_values,
    sort_by_coordinate,
)
from .spline import cubic_spline_fill  # noqa: F401
from .despike import check_goring_nikora, goring_nikora_mask  # noqa: F401
from .manager import QCBit, QualityManager, apply_qc  # noqa: F401
