"""Interactive score-browser: streamlit counterpart of the reference's
`WebApp` (visualize/vis.py:14-24), built on viz/report.py's analyses.

Run with:  streamlit run -m mocodad_tpu.viz.webapp -- --config <yaml>

streamlit is an optional dependency (not part of the TPU runtime image);
the serverless equivalent is viz/report.py's self-contained HTML report.
"""

from __future__ import annotations


def main() -> None:
    try:
        import streamlit as st
    except ImportError as e:  # pragma: no cover - optional dependency
        raise SystemExit(
            'streamlit is not installed; use '
            'mocodad_tpu.viz.report.report_from_saved_tensors for the '
            'static HTML report instead') from e

    import argparse

    from mocodad_tpu.config import load_config
    from mocodad_tpu.utils.tensors import load_tensors
    from mocodad_tpu.viz.report import clip_score_figure, per_person_scores

    parser = argparse.ArgumentParser()
    parser.add_argument('-c', '--config', required=True)
    args = parser.parse_args()
    cfg = load_config(args.config)

    st.title(f'Visualization of {cfg.dataset_choice}')
    from mocodad_tpu.config import effective_n_generated_samples
    t = load_tensors(cfg.ckpt_dir, cfg.split, cfg.aggregation_strategy,
                     effective_n_generated_samples(cfg))
    # 'pose'/'all' caches store poses in prediction.npy and the scalar
    # scores in loss.npy — prefer the latter (same rule as report.py and
    # the eval replay path)
    clips = per_person_scores(t.get('loss', t['prediction']), t['trans'],
                              t['metadata'], t['frames'], cfg.gt_path)
    key = st.selectbox('clip', sorted(clips))
    d = clips[key]
    log_scale = st.checkbox('log scale', value=False)
    fig = clip_score_figure(d['error_per_person'], d['gt'],
                            frames_shift=cfg.frames_shift,
                            kernel_size=cfg.filter_kernel_size,
                            log_scale=log_scale,
                            title=f'scene {key[0]} clip {key[1]}')
    st.pyplot(fig)


if __name__ == '__main__':
    main()
