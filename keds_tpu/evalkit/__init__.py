from keds_tpu.evalkit.metrics import (  # noqa: F401
    get_metrics_coco,
    get_metrics_fashion,
    get_metrics_cirr,
    get_cirr_testoutput,
    get_metrics_imgnet,
)
