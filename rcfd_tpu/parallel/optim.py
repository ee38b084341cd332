"""Adam optimizer with torch-exact semantics and convertible state.

Matches torch.optim.Adam as configured by the reference drivers
(src/radarnet_main.py:279-284, src/fusionnet_main.py:307-312): L2 weight
decay added to the gradient before the moment updates, bias correction,
denom = sqrt(v_hat) + eps.

State is {'count', 'mu', 'nu'} with mu/nu mirroring the params tree, so it
round-trips to the reference's torch Adam state_dict
(utils/checkpoint.py converters).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp


def init_adam(params) -> Dict[str, Any]:
    zeros = lambda t: jax.tree_util.tree_map(jnp.zeros_like, t)
    return {
        'count': jnp.zeros((), jnp.int32),
        'mu': zeros(params),
        'nu': zeros(params),
    }


def adam_step(params, grads, opt_state, lr, weight_decay: float = 0.0,
              b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """One Adam update. lr may be a traced scalar (per-epoch schedule)."""
    count = opt_state['count'] + 1
    t = count.astype(jnp.float32)
    bc1 = 1.0 - b1 ** t
    bc2 = 1.0 - b2 ** t

    def upd(p, g, m, v):
        if weight_decay != 0.0:
            g = g + weight_decay * p
        m = b1 * m + (1.0 - b1) * g
        v = b2 * v + (1.0 - b2) * jnp.square(g)
        m_hat = m / bc1
        v_hat = v / bc2
        new_p = p - lr * m_hat / (jnp.sqrt(v_hat) + eps)
        return new_p, m, v

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(opt_state['mu'])
    flat_v = treedef.flatten_up_to(opt_state['nu'])
    new_p, new_m, new_v = [], [], []
    for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v):
        a, b, c = upd(p, g, m, v)
        new_p.append(a)
        new_m.append(b)
        new_v.append(c)
    return (jax.tree_util.tree_unflatten(treedef, new_p),
            {'count': count,
             'mu': jax.tree_util.tree_unflatten(treedef, new_m),
             'nu': jax.tree_util.tree_unflatten(treedef, new_v)})
