from mocodad_tpu.viz.report import (  # noqa: F401
    clip_score_figure, hr_stats, html_report, per_person_scores,
    report_from_saved_tensors, stats_to_latex)
from mocodad_tpu.viz.vis import ClipVisualizer, COCO17_BONES  # noqa: F401
