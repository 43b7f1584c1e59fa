from tdspa.eval.tapvid3d_metrics import compute_tapvid3d_metrics, zero_metrics
from tdspa.eval.harness import (
    convert_predictions_to_tapvid3d_format,
    evaluate_batch,
    evaluate_model,
)
