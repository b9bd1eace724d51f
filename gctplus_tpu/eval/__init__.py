from gctplus_tpu.eval.metrics import (
    fraction_valid,
    fraction_unique,
    novelty,
    internal_diversity,
    snn,
    scaffold_metrics,
    property_error_stats,
    get_all_metrics,
)
