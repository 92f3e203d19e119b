import os

import pytest
import yaml

from mocodad_tpu.config import (Config, from_dict, init_args, load_config)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def all_shipped_configs():
    out = []
    for root, _, files in os.walk(os.path.join(REPO, 'config')):
        out += [os.path.join(root, f) for f in files if f.endswith('.yaml')]
    return sorted(out)


@pytest.mark.parametrize('path', all_shipped_configs())
def test_all_shipped_configs_parse(path, tmp_path):
    raw = yaml.safe_load(open(path))
    cfg = from_dict(raw)
    # redirect experiment dirs into tmp and run the derived-path logic
    cfg.exp_dir = str(tmp_path)
    cfg.create_experiment_dir = True
    cfg = init_args(cfg)
    assert os.path.isdir(cfg.ckpt_dir)
    assert cfg.gt_path
    assert set(cfg.pose_path) == {'train', 'test', 'validation'}
    # alias resolution + conditioning arithmetic must not raise
    n_cond, n_corrupt, input_n = cfg.conditioning_split()
    assert n_cond + n_corrupt == cfg.seg_len
    cond, corrupt = cfg.cond_corrupt_indices()
    if cond is not None:
        assert len(cond) == n_cond and len(corrupt) == n_corrupt
        assert sorted(cond + corrupt) == list(range(cfg.seg_len))


def test_strategy_aliases():
    for alias, canon in [('cat', 'concat'), ('add2layers', 'inject'),
                         ('interleave', 'inbetween_imp'),
                         ('random_indices', 'random_imp'),
                         ('none', 'no_condition')]:
        cfg = Config(conditioning_strategy=alias)
        assert cfg.strategy == canon


def test_conditioning_split_matches_reference_semantics():
    # list [0,1,2] with inject: cond 3 frames, corrupt 3, unet input 3
    cfg = Config(conditioning_strategy='inject', conditioning_indices=[0, 1, 2],
                 seg_len=6)
    assert cfg.conditioning_split() == (3, 3, 3)
    assert cfg.cond_corrupt_indices() == ((0, 1, 2), (3, 4, 5))

    # int 2 with concat: n_frames//2 = 3 cond, input is full window
    cfg = Config(conditioning_strategy='concat', conditioning_indices=2,
                 seg_len=6)
    assert cfg.conditioning_split() == (3, 3, 6)

    # inbetween with step 2: cond = 0,2,4
    cfg = Config(conditioning_strategy='inbetween_imp',
                 conditioning_indices=2, seg_len=6)
    assert cfg.conditioning_split() == (3, 3, 6)
    assert cfg.cond_corrupt_indices() == ((0, 2, 4), (1, 3, 5))

    # random_imp with int 3
    cfg = Config(conditioning_strategy='random_imp', conditioning_indices=3,
                 seg_len=6)
    assert cfg.conditioning_split() == (3, 3, 6)
    assert cfg.cond_corrupt_indices() == (None, None)

    # no_condition
    cfg = Config(conditioning_strategy='none', seg_len=6)
    assert cfg.conditioning_split() == (0, 6, 6)


def test_conditioning_split_consistent_with_selection():
    """The frame COUNT must equal what the selection actually takes for
    every strategy/step — incl. inbetween_imp steps that do not divide
    seg_len, where the reference's count (n_frames // step,
    models/mocodad.py:776) disagrees with its own selection
    (arange(0, n_frames, step), :734) and crashes in a reshape; the
    quirk fix counts the selection."""
    cases = [('inbetween_imp', 2, 6), ('inbetween_imp', 2, 7),
             ('inbetween_imp', 5, 24), ('inbetween_imp', [0, 3], 6),
             ('concat', 2, 6), ('concat', 4, 6),
             ('inject', 3, 6), ('inject', [0, 1, 2], 6),
             ('no_condition', 2, 6)]
    for strategy, ci, seg in cases:
        cfg = Config(conditioning_strategy=strategy,
                     conditioning_indices=ci, seg_len=seg)
        n_cond, n_corrupt, _ = cfg.conditioning_split()
        cond, corrupt = cfg.cond_corrupt_indices()
        assert len(cond) == n_cond, (strategy, ci, seg)
        assert len(corrupt) == n_corrupt, (strategy, ci, seg)
        assert sorted(cond + corrupt) == list(range(seg))
    # the previously-miscounted case: seg_len=24, step=5 selects
    # (0,5,10,15,20) = 5 conditioning frames, not 24//5 = 4
    cfg = Config(conditioning_strategy='inbetween_imp',
                 conditioning_indices=5, seg_len=24)
    assert cfg.conditioning_split()[0] == 5


def test_conditioning_validation_errors():
    with pytest.raises(ValueError):
        Config(conditioning_strategy='random_imp',
               conditioning_indices=[0, 1]).conditioning_split()
    with pytest.raises(ValueError):
        Config(conditioning_strategy='inject',
               conditioning_indices=[0, 2], seg_len=6).conditioning_split()
    with pytest.raises(ValueError):
        Config(conditioning_strategy='inject',
               conditioning_indices=[1, 2], seg_len=6).conditioning_split()


def test_n_joints_inference():
    assert Config(headless=True).n_joints == 14
    assert Config(kp18_format=True).n_joints == 18
    assert Config().n_joints == 17


def test_extras_roundtrip(tmp_path):
    p = tmp_path / 'c.yaml'
    p.write_text('debug: true\nsome_future_key: 7\nexp_dir: "%s"\n'
                 'test_path: "x"\n' % tmp_path)
    cfg = load_config(str(p))
    assert cfg.some_future_key == 7
    assert cfg.ae_epochs == 10  # debug truncation (ref utils/argparser.py:5-6)
    assert 'some_future_key' in cfg.to_dict()
    # config copied into ckpt_dir (ref train_MoCoDAD.py:33)
    assert os.path.exists(os.path.join(cfg.ckpt_dir, 'config.yaml'))
