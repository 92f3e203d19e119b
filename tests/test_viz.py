"""Visualization smoke tests: animation export, score-analysis figures,
HTML report, stats LaTeX (counterparts of visualize/vis.py and
visualize/visualize.ipynb, which the reference ships untested)."""

import os

import numpy as np
import pytest

matplotlib = pytest.importorskip('matplotlib')

from mocodad_tpu.viz import (ClipVisualizer, clip_score_figure, hr_stats,
                             html_report, per_person_scores, stats_to_latex)


@pytest.fixture
def gt_dir(tmp_path, rng):
    d = tmp_path / 'gt'
    d.mkdir()
    for scene, clip, n in [(1, 1, 40), (1, 2, 30)]:
        gt = np.zeros(n, np.int64)
        gt[n // 2:n // 2 + 5] = 1
        np.save(d / f'{scene}_{clip}.npy', gt)
    return str(d)


def _window_outputs(rng):
    """Fake per-window losses for scene 1 clips 1-2, two persons each."""
    rows = []
    for clip, n in [(1, 40), (2, 30)]:
        for person in (1, 2):
            for start in range(0, n - 6, 3):
                rows.append((rng.random(), 0, (1, clip, person, start),
                             np.arange(start + 1, start + 7)))
    out = np.array([r[0] for r in rows])
    trans = np.array([r[1] for r in rows], np.int32)
    meta = np.array([r[2] for r in rows], np.int64)
    frames = np.array([r[3] for r in rows], np.int32)
    return out, trans, meta, frames


def test_per_person_scores_groups_clips(gt_dir, rng):
    out, trans, meta, frames = _window_outputs(rng)
    clips = per_person_scores(out, trans, meta, frames, gt_dir)
    assert set(clips) == {(1, 1), (1, 2)}
    epp = clips[(1, 1)]['error_per_person']
    assert epp.shape == (2, 40)
    assert np.all(np.isfinite(epp))


def test_clip_score_figure_and_latex(gt_dir, rng, tmp_path):
    out, trans, meta, frames = _window_outputs(rng)
    clips = per_person_scores(out, trans, meta, frames, gt_dir)
    d = clips[(1, 1)]
    png = str(tmp_path / 'clip.png')
    clip_score_figure(d['error_per_person'], d['gt'], png, kernel_size=3.0)
    assert os.path.getsize(png) > 1000

    rows = hr_stats(gt_dir)
    assert rows[0]['length'] == 40 and rows[0]['pct_abnormal'] > 0
    tex = stats_to_latex(rows, str(tmp_path / 't.tex'))
    assert r'\begin{tabular}' in tex and '1_1' in tex


def test_html_report_self_contained(gt_dir, rng, tmp_path):
    out, trans, meta, frames = _window_outputs(rng)
    path = html_report(out, trans, meta, frames, gt_dir,
                       str(tmp_path / 'report.html'), kernel_size=3.0,
                       auc=0.87)
    text = open(path).read()
    assert 'data:image/png;base64,' in text
    assert '0.8700' in text and 'scene 1 clip 2' in text


def test_report_from_pose_cache_uses_loss_route(gt_dir, rng, tmp_path):
    """Caches written under model_return_value 'pose' hold poses in
    'prediction' and the scalar route in 'loss' — the report helper must
    score the losses (same fallback as eval --load_tensors)."""
    from mocodad_tpu.config import Config
    from mocodad_tpu.utils.tensors import save_tensors
    from mocodad_tpu.viz import report_from_saved_tensors

    out, trans, meta, frames = _window_outputs(rng)
    pose = rng.normal(size=(len(out), 2, 3, 17)).astype(np.float32)
    ckpt_dir = str(tmp_path / 'ckpt')
    save_tensors({'prediction': pose, 'loss': out, 'gt_data': pose,
                  'trans': trans, 'metadata': meta, 'frames': frames},
                 ckpt_dir, 'test', 'best', 2)
    cfg = Config(split='test', aggregation_strategy='best',
                 n_generated_samples=2, num_transform=1, gt_path=gt_dir,
                 use_hr=False, pad_size=-1, filter_kernel_size=3,
                 frames_shift=1, dataset_choice='UBnormal',
                 exp_dir=str(tmp_path), dir_name='x')
    cfg.ckpt_dir = ckpt_dir
    path = report_from_saved_tensors(cfg)
    assert os.path.getsize(path) > 1000


def test_animation_gif_export(tmp_path, rng):
    # 2 actors x 8 frames of 17 joints, image-space
    trajs = {'0001': rng.uniform(50, 300, (8, 34)),
             '0002': rng.uniform(50, 300, (8, 34))}
    scores = rng.random(8)
    gt = np.array([0, 0, 0, 1, 1, 0, 0, 0])
    vis = ClipVisualizer(trajs, vid_res=(360, 360), scores=scores, gt=gt)
    gif = str(tmp_path / 'clip.gif')
    vis.animate(out_path=gif, fps=4)
    assert os.path.getsize(gif) > 5000
    png = str(tmp_path / 'frame.png')
    vis.save_frame(3, png)
    assert os.path.getsize(png) > 1000


def test_webapp_with_streamlit_stub(gt_dir, rng, tmp_path, monkeypatch):
    """viz/webapp.py end-to-end via a streamlit stub (the real package is
    absent from this image, so this is the module's only coverage — same
    approach as the wandb stub in test_training.py): the CLI parses the
    YAML, resolves the saved-tensor cache through
    effective_n_generated_samples, prefers the 'loss' route of a pose
    cache, and renders the selected clip's figure into st.pyplot."""
    import sys
    import types

    import yaml

    from mocodad_tpu.utils.tensors import save_tensors

    out, trans, meta, frames = _window_outputs(rng)
    pose = rng.normal(size=(len(out), 2, 3, 17)).astype(np.float32)
    ckpt_dir = str(tmp_path / 'checkpoints' / 'UBnormal' / 'webapp')
    save_tensors({'prediction': pose, 'loss': out, 'gt_data': pose,
                  'trans': trans, 'metadata': meta, 'frames': frames},
                 ckpt_dir, 'test', 'best', 2)

    raw = dict(split='test', dataset_choice='UBnormal', dir_name='webapp',
               exp_dir=str(tmp_path / 'checkpoints'),
               data_dir=str(tmp_path / 'data'),
               test_path=gt_dir, create_experiment_dir=False,
               aggregation_strategy='best', n_generated_samples=2,
               num_transform=1, use_hr=False, pad_size=-1,
               filter_kernel_size=3, frames_shift=1, seg_len=6,
               validation=False)
    yaml_path = str(tmp_path / 'webapp.yaml')
    with open(yaml_path, 'w') as f:
        yaml.safe_dump(raw, f)

    calls = {'title': [], 'select': [], 'figs': []}

    stub = types.ModuleType('streamlit')
    stub.title = lambda s: calls['title'].append(s)

    def selectbox(label, options):
        calls['select'].append(list(options))
        return list(options)[0]

    stub.selectbox = selectbox
    stub.checkbox = lambda label, value=False: value
    stub.pyplot = lambda fig: calls['figs'].append(fig)
    monkeypatch.setitem(sys.modules, 'streamlit', stub)
    monkeypatch.setattr(sys, 'argv', ['webapp', '--config', yaml_path])

    from mocodad_tpu.viz import webapp
    webapp.main()

    assert calls['title'] == ['Visualization of UBnormal']
    # clips come sorted from per_person_scores over the gt tree
    assert calls['select'] == [[(1, 1), (1, 2)]]
    assert len(calls['figs']) == 1
    ax = calls['figs'][0].axes[0]
    assert 'scene 1 clip 1' in ax.get_title()
