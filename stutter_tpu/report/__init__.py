from stutter_tpu.report.plots import (
    plot_confusion_matrices,
    plot_per_class_metrics,
    plot_layer_comparison,
    plot_grid_comparison,
)
from stutter_tpu.report.summaries import (
    write_classification_report,
    write_comparison_csv,
    write_final_summary,
)
