"""Reference (PyTorch/Lightning) checkpoint interop.

The reference's reproduction protocol is "evaluate a published pretrained
checkpoint" (/root/reference/README.md:126-137, eval_MoCoDAD.py:32-38).
This module maps a reference torch state dict onto this framework's flax
variables tree so those checkpoints run directly.  The mapping is
mechanical because module naming mirrors the reference:

  torch (ref models/mocodad.py:90-126)        flax (models/mocodad.py)
  ------------------------------------        ------------------------
  model.st_gcnnsp1a.0 / st_gcnnsd1.{0,1} ...  params['model']['p1a'/'d1_0'..]
  model.down1/down2/up2/up3 (CNN_layer)       params['model']['down1'..]
  model.to_time_dim / rev_to_time_dim         *_kernel / *_bias
  condition_encoder.encoder.model_layers.i    ['condition_encoder']['encoder']
                                                ['layer_i']
  condition_encoder.btlnk / rev_btlnk         btlnk_* / rev_btlnk_*
  denoiser.net.i(.0) / cond_layers.i          ['denoiser'] w{i}_* / c{i}_* /
                                                bn{i}

Weight-layout conventions converted along the way: torch Linear stores
(out, in) -> flax (in, out); 1x1 Conv2d stores (out, in, 1, 1) -> dense
(in, out); BatchNorm weight/bias -> scale/bias + running stats into the
batch_stats collection.  No torch tensors leave this module: everything
is converted to numpy.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

# torch ModuleList name -> (flax layer prefix, index offset)
_UNET_STACKS = {
    'st_gcnnsp1a': ('p1a', None),   # single layer, no index suffix
    'st_gcnnsd1': ('d1', 0),
    'st_gcnnsd2': ('d2', 0),
    'st_gcnnsd3': ('d3', 0),
    'st_gcnnsu4': ('u4', 0),
    'st_gcnnsu3': ('u3', 0),
}
_JOINT_MIXES = ('down1', 'down2', 'up2', 'up3')


def _as_np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, 'detach') else t,
                      dtype=np.float32)


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _gcnn_entry(rest: list, value: np.ndarray
                ) -> Optional[Tuple[str, Tuple[str, ...], np.ndarray]]:
    """Map one ST_GCNN_layer torch key (ref models/gcae/stsgcn.py:9-116)
    into (collection, relative path, converted value)."""
    head = rest[0]
    if head == 'gcn':                     # gcn.A / gcn.T
        return 'params', ('gcn', rest[1]), value
    if head in ('tcn', 'residual'):
        name = 'tcn' if head == 'tcn' else 'residual'
        sub, leaf = rest[1], rest[2]
        if sub == '0':                    # 1x1 Conv2d
            if leaf == 'weight':          # (Co, Ci, 1, 1) -> (Ci, Co)
                return 'params', (f'{name}_kernel',), value[:, :, 0, 0].T
            return 'params', (f'{name}_bias',), value
        if sub == '1':                    # BatchNorm2d
            bn = f'{name}_bn'
            if leaf == 'weight':
                return 'params', (bn, 'scale'), value
            if leaf == 'bias':
                return 'params', (bn, 'bias'), value
            if leaf == 'running_mean':
                return 'batch_stats', (bn, 'mean'), value
            if leaf == 'running_var':
                return 'batch_stats', (bn, 'var'), value
            return None                   # num_batches_tracked
    if head == 'prelu':
        return 'params', ('PReLU_0', 'negative_slope'), value.reshape(())
    if head == 'emb_layer':               # emb_layer.1 = Linear(E, Co)
        if rest[2] == 'weight':
            return 'params', ('emb_kernel',), value.T
        return 'params', ('emb_bias',), value
    return None


def _joint_mix_entry(rest: list, value: np.ndarray
                     ) -> Optional[Tuple[str, Tuple[str, ...], np.ndarray]]:
    """CNN_layer (ref models/gcae/stsgcn.py:161-199): block.0 Conv2d over the
    joints 'channel' + block.1 BatchNorm2d."""
    sub, leaf = rest[1], rest[2]
    if sub == '0':
        if leaf == 'weight':              # (Vo, Vi, 1, 1) -> (Vi, Vo)
            return 'params', ('kernel',), value[:, :, 0, 0].T
        return 'params', ('bias',), value
    if sub == '1':
        if leaf == 'weight':
            return 'params', ('BatchNorm_0', 'scale'), value
        if leaf == 'bias':
            return 'params', ('BatchNorm_0', 'bias'), value
        if leaf == 'running_mean':
            return 'batch_stats', ('BatchNorm_0', 'mean'), value
        if leaf == 'running_var':
            return 'batch_stats', ('BatchNorm_0', 'var'), value
    return None


def _linear_entry(flax_base: str, leaf: str, value: np.ndarray
                  ) -> Tuple[str, Tuple[str, ...], np.ndarray]:
    if leaf == 'weight':
        return 'params', (f'{flax_base}_kernel',), value.T
    return 'params', (f'{flax_base}_bias',), value


def map_torch_key(key: str, value: np.ndarray
                  ) -> Optional[Tuple[str, Tuple[str, ...], np.ndarray]]:
    """One torch state-dict entry -> (collection, flax path, value);
    None for entries with no flax counterpart (num_batches_tracked, EMA
    copies, optimizer state)."""
    parts = key.split('.')
    root = parts[0]

    if root in ('model', 'condition_encoder', 'denoiser'):
        prefix: Tuple[str, ...] = (root,)
        rest = parts[1:]
    else:
        return None

    if root == 'denoiser':
        # net.{i}[.0].weight / net.{i}.1.* (BN) / cond_layers.{i}.*
        # (ref models/common/components.py:229-245)
        stack, idx = rest[0], rest[1]
        if stack == 'net':
            if rest[2] in ('weight', 'bias'):        # last layer: bare Linear
                col, p, v = _linear_entry(f'w{idx}', rest[2], value)
                return col, prefix + p, v
            if rest[2] == '0':
                col, p, v = _linear_entry(f'w{idx}', rest[3], value)
                return col, prefix + p, v
            if rest[2] == '1':                       # BatchNorm1d
                leaf = rest[3]
                bn = f'bn{idx}'
                if leaf == 'weight':
                    return 'params', prefix + (bn, 'scale'), value
                if leaf == 'bias':
                    return 'params', prefix + (bn, 'bias'), value
                if leaf == 'running_mean':
                    return 'batch_stats', prefix + (bn, 'mean'), value
                if leaf == 'running_var':
                    return 'batch_stats', prefix + (bn, 'var'), value
            return None
        if stack == 'cond_layers':
            col, p, v = _linear_entry(f'c{idx}', rest[2], value)
            return col, prefix + p, v
        return None

    if root == 'condition_encoder':
        head = rest[0]
        if head in ('encoder', 'decoder'):
            # encoder.model_layers.{i}.<gcnn...>
            i = rest[2]
            out = _gcnn_entry(rest[3:], value)
            if out is None:
                return None
            col, p, v = out
            return col, prefix + (head, f'layer_{i}') + p, v
        if head in ('btlnk', 'rev_btlnk'):
            col, p, v = _linear_entry(head, rest[1], value)
            return col, prefix + p, v
        # E_unet condition encoder: same structure as the main net
        out = _map_unet_rest(rest, value)
        if out is None:
            return None
        col, p, v = out
        return col, prefix + p, v

    out = _map_unet_rest(rest, value)
    if out is None:
        return None
    col, p, v = out
    return col, prefix + p, v


def _map_unet_rest(rest: list, value: np.ndarray
                   ) -> Optional[Tuple[str, Tuple[str, ...], np.ndarray]]:
    head = rest[0]
    if head in _UNET_STACKS:
        flax_prefix, _ = _UNET_STACKS[head]
        idx = rest[1]
        layer = flax_prefix if flax_prefix == 'p1a' else f'{flax_prefix}_{idx}'
        out = _gcnn_entry(rest[2:], value)
        if out is None:
            return None
        col, p, v = out
        return col, (layer,) + p, v
    if head in _JOINT_MIXES:
        out = _joint_mix_entry(rest[1:], value)
        if out is None:
            return None
        col, p, v = out
        return col, (head,) + p, v
    if head in ('to_time_dim', 'rev_to_time_dim'):
        return _linear_entry(head, rest[1], value)
    return None


def convert_torch_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Dict]:
    """Torch state dict (Lightning 'state_dict' payload or bare module
    dict) -> {'params': ..., 'batch_stats': ...} nested numpy trees."""
    out: Dict[str, Dict] = {'params': {}, 'batch_stats': {}}
    unmapped = []
    for key, val in state_dict.items():
        # EMA shadow copies (timm ModelEmaV2 under the reference's
        # EMACallback, utils/ema.py:18-91) are deliberately skipped: a
        # dict holding both raw and 'model_ema.module.*' weights must map
        # the RAW ones, deterministically — the reference stores EMA state
        # under a separate 'state_dict_ema' payload anyway.
        if key.startswith('model_ema.'):
            continue
        key = re.sub(r'^module\.', '', key)
        entry = map_torch_key(key, _as_np(val))
        if entry is None:
            if not key.endswith('num_batches_tracked'):
                unmapped.append(key)
            continue
        col, path, v = entry
        _set(out[col], path, v)
    out['_unmapped'] = unmapped
    return out


_INV_UNET_STACKS = {v[0]: k for k, v in _UNET_STACKS.items()}


def _export_gcnn(prefix: str, p: Dict, s: Optional[Dict], out: Dict) -> None:
    a = p['gcn']
    out[f'{prefix}.gcn.A'] = _as_np(a['A'])
    out[f'{prefix}.gcn.T'] = _as_np(a['T'])
    out[f'{prefix}.tcn.0.weight'] = _as_np(p['tcn_kernel']).T[:, :, None, None]
    if 'tcn_bias' in p:
        out[f'{prefix}.tcn.0.bias'] = _as_np(p['tcn_bias'])
    _export_bn(f'{prefix}.tcn.1', p['tcn_bn'],
               s['tcn_bn'] if s else None, out)
    if 'residual_kernel' in p:
        out[f'{prefix}.residual.0.weight'] = \
            _as_np(p['residual_kernel']).T[:, :, None, None]
        if 'residual_bias' in p:
            out[f'{prefix}.residual.0.bias'] = _as_np(p['residual_bias'])
        _export_bn(f'{prefix}.residual.1', p['residual_bn'],
                   s['residual_bn'] if s else None, out)
    out[f'{prefix}.prelu.weight'] = \
        _as_np(p['PReLU_0']['negative_slope']).reshape(1)
    if 'emb_kernel' in p:
        out[f'{prefix}.emb_layer.1.weight'] = _as_np(p['emb_kernel']).T
        out[f'{prefix}.emb_layer.1.bias'] = _as_np(p['emb_bias'])


def _export_bn(prefix: str, p: Dict, s: Optional[Dict], out: Dict) -> None:
    out[f'{prefix}.weight'] = _as_np(p['scale'])
    out[f'{prefix}.bias'] = _as_np(p['bias'])
    if s is not None:
        out[f'{prefix}.running_mean'] = _as_np(s['mean'])
        out[f'{prefix}.running_var'] = _as_np(s['var'])


def export_torch_state_dict(variables: Dict) -> Dict[str, np.ndarray]:
    """Inverse of convert_torch_state_dict: emit a reference-named torch
    state dict from a flax variables tree, so models trained here can be
    consumed by the reference implementation."""
    params = variables['params']
    stats = variables.get('batch_stats', {})
    out: Dict[str, np.ndarray] = {}

    for root, p in params.items():
        s = stats.get(root, {})
        if root == 'denoiser':
            i = 0
            while f'w{i}_kernel' in p:
                last = f'w{i + 1}_kernel' not in p
                base = f'denoiser.net.{i}' if last else f'denoiser.net.{i}.0'
                out[f'{base}.weight'] = _as_np(p[f'w{i}_kernel']).T
                if f'w{i}_bias' in p:
                    out[f'{base}.bias'] = _as_np(p[f'w{i}_bias'])
                if not last:
                    _export_bn(f'denoiser.net.{i}.1', p[f'bn{i}'],
                               s.get(f'bn{i}'), out)
                out[f'denoiser.cond_layers.{i}.weight'] = \
                    _as_np(p[f'c{i}_kernel']).T
                if f'c{i}_bias' in p:
                    out[f'denoiser.cond_layers.{i}.bias'] = \
                        _as_np(p[f'c{i}_bias'])
                i += 1
            continue
        for name, sub in p.items():
            ss = s.get(name, {}) if isinstance(s, dict) else {}
            if name in ('encoder', 'decoder'):
                for lname, lp in sub.items():
                    i = lname.split('_')[1]
                    _export_gcnn(f'{root}.{name}.model_layers.{i}', lp,
                                 ss.get(lname), out)
            elif name == 'p1a':
                _export_gcnn(f'{root}.st_gcnnsp1a.0', sub, ss, out)
            elif re.fullmatch(r'[du][1-4]_[0-9]', name):
                stack = _INV_UNET_STACKS[name.split('_')[0]]
                _export_gcnn(f'{root}.{stack}.{name.split("_")[1]}', sub,
                             ss, out)
            elif name in _JOINT_MIXES:
                out[f'{root}.{name}.block.0.weight'] = \
                    _as_np(sub['kernel']).T[:, :, None, None]
                if 'bias' in sub:
                    out[f'{root}.{name}.block.0.bias'] = _as_np(sub['bias'])
                _export_bn(f'{root}.{name}.block.1', sub['BatchNorm_0'],
                           ss.get('BatchNorm_0'), out)
            elif name.endswith('_kernel'):
                base = name[:-len('_kernel')]
                out[f'{root}.{base}.weight'] = _as_np(sub).T
            elif name.endswith('_bias'):
                base = name[:-len('_bias')]
                out[f'{root}.{base}.bias'] = _as_np(sub)
            else:
                raise ValueError(f'unhandled flax entry {root}.{name}')
    return out


def load_torch_checkpoint(path: str, template_variables: Dict,
                          strict: bool = True,
                          use_ema: bool = False) -> Dict:
    """Load a reference .ckpt/.pt file into a flax variables tree matching
    `template_variables` (shapes validated leaf by leaf).

    Accepts Lightning checkpoints ({'state_dict': ...}) and bare module
    state dicts (ref eval_MoCoDAD.py:32-38 consumes the former).

    use_ema: load the EMA shadow weights instead of the raw ones — from
    the reference EMACallback's separate 'state_dict_ema' payload
    (ref utils/ema.py:66-72) when present, else from embedded
    'model_ema.module.*' keys; falls back to raw weights with a warning
    when the checkpoint carries no EMA copy.
    """
    import torch  # CPU-only usage; baked into the image

    raw = torch.load(path, map_location='cpu', weights_only=False)
    sd = raw.get('state_dict', raw) if isinstance(raw, dict) else raw
    if use_ema:
        if isinstance(raw, dict) and raw.get('state_dict_ema'):
            sd = raw['state_dict_ema']
        else:
            prefix = 'model_ema.module.'
            ema = {k[len(prefix):]: v for k, v in sd.items()
                   if k.startswith(prefix)}
            if ema:
                sd = ema
            else:
                import sys
                print('WARNING: use_ema requested but the torch checkpoint '
                      'carries no EMA payload; loading raw weights',
                      file=sys.stderr)
    conv = convert_torch_state_dict(sd)
    if strict and conv['_unmapped']:
        raise ValueError(f'unmapped torch keys: {conv["_unmapped"][:10]}')
    import flax.serialization as ser

    missing = []
    merged = {}
    for col in template_variables:
        tgt = ser.to_state_dict(template_variables[col])
        src = conv.get(col, {})

        def merge(t, s, path=''):
            if isinstance(t, dict):
                return {k: merge(t[k], s.get(k) if isinstance(s, dict)
                                 else None, f'{path}/{k}') for k in t}
            if s is None:
                if strict:
                    raise ValueError(f'missing torch weight for {path}')
                missing.append(path)
                return t
            if np.shape(s) != np.shape(t):
                raise ValueError(
                    f'shape mismatch at {path}: torch {np.shape(s)} vs '
                    f'flax {np.shape(t)}')
            return np.asarray(s, dtype=np.asarray(t).dtype)

        merged[col] = ser.from_state_dict(template_variables[col],
                                          merge(tgt, src, f'/{col}'))
    if not strict and (conv['_unmapped'] or missing):
        # Naming drift in a published checkpoint would otherwise produce a
        # plausible-looking model with silently random weights.
        import sys
        print(f'WARNING: torch checkpoint {path!r} loaded non-strictly: '
              f'{len(conv["_unmapped"])} unmapped torch keys '
              f'{conv["_unmapped"][:5]}, {len(missing)} flax leaves kept '
              f'at template init {missing[:5]}', file=sys.stderr)
    return merged
