"""Native CSV parser (csrc/trajectory_loader.cpp) vs the Python fallback.

Contract: both tiers accept the same well-formed files with identical
values, and a malformed file must NEVER yield a silently corrupted
matrix — the native parser rejects (returns None -> caller falls back)
and the fallback raises.  (The reference parses with np.loadtxt,
utils/data.py:228.)
"""

import os

import numpy as np
import pytest

from mocodad_tpu.data import native
from mocodad_tpu.data.trajectories import read_csv_matrix


def _write(tmp_path, name, text, mode='w'):
    p = tmp_path / name
    with open(p, mode) as f:
        f.write(text)
    return str(p)


requires_native = pytest.mark.skipif(not native.available(),
                                     reason='no C++ toolchain')


@requires_native
def test_native_matches_fallback_and_loadtxt(tmp_path):
    rng = np.random.default_rng(0)
    m = rng.normal(scale=100, size=(37, 35)).astype(np.float32)
    lines = '\n'.join(','.join(f'{v:.6g}' for v in row) for row in m)
    for suffix in ('\n', ''):       # with and without trailing newline
        p = _write(tmp_path, f'a{len(suffix)}.csv', lines + suffix)
        got = native.read_csv_matrix(p)
        assert got is not None
        ref = np.loadtxt(p, delimiter=',', dtype=np.float32, ndmin=2)
        np.testing.assert_array_equal(got, ref)
        np.testing.assert_array_equal(read_csv_matrix(p), ref)


@requires_native
def test_native_accepts_variants(tmp_path):
    cases = {
        'crlf.csv': '1,2\r\n3,4\r\n',
        'blank_interior.csv': '1,2\n\n   \n3,4\n',
        'spaces.csv': ' 1 , 2 \n 3 , 4 \n',
        'sci.csv': '1e3,-2.5E-2\n+3.25,nan\n',
        'single_col.csv': '1.5\n2.5\n',
    }
    for name, text in cases.items():
        p = _write(tmp_path, name, text)
        got = native.read_csv_matrix(p)
        assert got is not None, name
        fb_tokens = [t for ln in text.split('\n') if ln.strip()
                     for t in ln.replace(',', ' ').split()]
        want = np.array(fb_tokens, dtype=np.float32).reshape(got.shape)
        np.testing.assert_array_equal(np.nan_to_num(got, nan=-1),
                                      np.nan_to_num(want, nan=-1), err_msg=name)


@requires_native
def test_native_rejects_malformed(tmp_path):
    cases = {
        # a field that splits into two parsable tokens used to corrupt
        # the matrix silently (1.2.3 -> 1.2, 0.3)
        'double_dot.csv': '1.2.3,4\n5,6\n',
        'ragged_short.csv': '1,2\n3\n',
        'ragged_long.csv': '1,2\n3,4,5,6\n',
        'text_field.csv': '1,abc\n2,3\n',
        'empty_field.csv': '1,,3\n4,5,6\n',
        'semicolons.csv': '1;2\n3;4\n',
        'hex_float.csv': '0x10,2\n3,4\n',
        'trailing_junk.csv': '1,2 x\n3,4\n',
    }
    for name, text in cases.items():
        p = _write(tmp_path, name, text)
        assert native.read_csv_matrix(p) is None, \
            f'{name} must be rejected, not silently parsed'
        # the fallback must also refuse (never corrupt)
        with pytest.raises(ValueError):
            read_csv_matrix(p)


def test_fallback_handles_bom_and_blank_lines(tmp_path):
    p = _write(tmp_path, 'bom.csv', b'\xef\xbb\xbf1,2\n\n3,4\n', mode='wb')
    want = np.array([[1, 2], [3, 4]], dtype=np.float32)
    np.testing.assert_array_equal(read_csv_matrix(p), want)
    if native.available():
        # the BOM makes the first field unparsable for the native tier,
        # which must reject (fall back), not corrupt
        got = native.read_csv_matrix(p)
        assert got is None or np.array_equal(got, want)


@requires_native
def test_build_is_atomic_and_self_heals(tmp_path, monkeypatch):
    """A stale/corrupt .so must trigger one rebuild instead of disabling
    the native tier forever."""
    import importlib
    import shutil

    workdir = tmp_path / 'csrc'
    workdir.mkdir()
    shutil.copy(os.path.join(native._CSRC, 'trajectory_loader.cpp'),
                workdir / 'trajectory_loader.cpp')
    # a torn half-written library, NEWER than the source
    with open(workdir / 'libtrajloader.so', 'wb') as f:
        f.write(b'\x7fELF garbage')
    os.utime(workdir / 'trajectory_loader.cpp', (0, 0))

    mod = importlib.import_module('mocodad_tpu.data.native')
    monkeypatch.setattr(mod, '_CSRC', str(workdir))
    monkeypatch.setattr(mod, '_LIB_PATH', str(workdir / 'libtrajloader.so'))
    monkeypatch.setattr(mod, '_SRC_PATH',
                        str(workdir / 'trajectory_loader.cpp'))
    monkeypatch.setattr(mod, '_lib', None)
    monkeypatch.setattr(mod, '_lib_failed', False)

    p = _write(tmp_path, 'ok.csv', '1,2\n3,4\n')
    got = mod.read_csv_matrix(p)
    assert got is not None, 'stale library did not self-heal via rebuild'
    np.testing.assert_array_equal(got, [[1, 2], [3, 4]])