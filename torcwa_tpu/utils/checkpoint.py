"""Optimization-state checkpoint / resume.

The reference's long optimizations (Example6: 800 iterations) keep all
state in RAM and cannot resume after a crash (SURVEY.md §5).  Here any
pytree of arrays (density rho, ADAM moments, iteration counter, RNG key,
FoM history) round-trips through a single .npz file.
"""

import numpy as np
import jax

__all__ = ['save_state', 'load_state']

_SEP = '/'


def _flatten(tree, prefix=''):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f'{prefix}{k}{_SEP}'))
    elif isinstance(tree, (list, tuple)):
        tag = 'T' if isinstance(tree, tuple) else 'L'
        out[f'{prefix}__kind__'] = np.asarray(tag)
        for i, v in enumerate(tree):
            out.update(_flatten(v, f'{prefix}{i}{_SEP}'))
    else:
        out[prefix.rstrip(_SEP)] = np.asarray(tree)
    return out


def save_state(path, state):
    """Save a pytree (nested dict/list/tuple of arrays/scalars) to .npz."""
    np.savez(path, **_flatten(state))


def load_state(path):
    """Load a pytree saved by :func:`save_state`; arrays come back as
    device arrays."""
    data = dict(np.load(path, allow_pickle=False))

    def build(prefix):
        leaf_key = prefix.rstrip(_SEP)
        if leaf_key in data:
            return jax.numpy.asarray(data[leaf_key])
        kind_key = f'{prefix}__kind__'
        children = [k for k in data
                    if k.startswith(prefix) and k != kind_key]
        direct = {k[len(prefix):].split(_SEP)[0] for k in children}
        direct.discard('__kind__')
        if kind_key in data:
            items = [build(f'{prefix}{i}{_SEP}') for i in range(len(direct))]
            return tuple(items) if str(data[kind_key]) == 'T' else items
        return {k: build(f'{prefix}{k}{_SEP}') for k in sorted(direct)}

    return build('')
