"""Optimization-state checkpoint / resume.

The reference's long optimizations (Example6: 800 iterations) keep all
state in RAM and cannot resume after a crash (SURVEY.md §5).  Here any
pytree of arrays (density rho, ADAM moments, iteration counter, RNG key,
FoM history) round-trips through a single .npz file.

Container nodes carry explicit markers so empty containers and sparse
flattenings round-trip exactly: list/tuple nodes store ``__kind__``
('L'/'T') and ``__len__``; dict nodes store ``__kind__`` = 'D'.  Dict keys
containing the separator '/' are rejected (they would corrupt the tree).
"""

import numpy as np
import jax

__all__ = ['save_state', 'load_state']

_SEP = '/'


def _flatten(tree, prefix=''):
    out = {}
    if isinstance(tree, dict):
        out[f'{prefix}__kind__'] = np.asarray('D')
        for k, v in tree.items():
            if _SEP in str(k):
                raise ValueError(
                    f'dict key {k!r} contains the reserved separator {_SEP!r}')
            out.update(_flatten(v, f'{prefix}{k}{_SEP}'))
    elif isinstance(tree, (list, tuple)):
        tag = 'T' if isinstance(tree, tuple) else 'L'
        out[f'{prefix}__kind__'] = np.asarray(tag)
        out[f'{prefix}__len__'] = np.asarray(len(tree))
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
        len_key = f'{prefix}__len__'
        children = [k for k in data
                    if k.startswith(prefix) and k not in (kind_key, len_key)]
        direct = {k[len(prefix):].split(_SEP)[0] for k in children}
        direct -= {'__kind__', '__len__'}
        kind = str(data[kind_key]) if kind_key in data else 'D'
        if kind in ('L', 'T'):
            if len_key in data:
                n = int(data[len_key])
            else:
                # legacy files without a length marker: max index + 1 (does
                # not shift positions when an element flattened to nothing)
                n = max((int(d) + 1 for d in direct), default=0)
            items = [build(f'{prefix}{i}{_SEP}') for i in range(n)]
            return tuple(items) if kind == 'T' else items
        return {k: build(f'{prefix}{k}{_SEP}') for k in sorted(direct)}

    return build('')
