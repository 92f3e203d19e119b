from mocodad_tpu.viz.vis import ClipVisualizer, COCO17_BONES  # noqa: F401
