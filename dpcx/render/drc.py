"""Stage 4: DRC-style expected-visibility ray reduction.

Reference parity: dpc/util/drc.py::drc_projection,
::drc_event_probabilities_impl, ::drc_depth_projection (SURVEY.md §2.2 #6).
Along the camera axis (grid axis 1 = z), per-cell occupancies o_i in [0, 1]
become ray-termination probabilities via the cumulative transmittance
T_i = prod_{j<i}(1 - o_j):

  p(stop at i) = o_i * T_i
  silhouette   = 1 - prod_i(1 - o_i) = sum_i p(stop at i)
  exp. depth   = sum_i d_i * p(stop at i) + d_far * T_D

Both the plain-product and the log-space variants are implemented (the
reference flag-gates these, SURVEY.md #6). The cumprod gradient is handled by
XLA's cumprod VJP; the log variant adds an epsilon so fully-occupied cells
don't produce -inf (the "exclusive-product trick" concern from SURVEY.md §7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def drc_event_probabilities(
    occupancy: jax.Array, logsum: bool = False, eps: float = 1e-5
) -> tuple[jax.Array, jax.Array]:
    """occupancy [B, Z, Y, X] (clipped to [0,1]) ->
    (p_stop [B, Z, Y, X], total_transmittance [B, Y, X])."""
    o = jnp.clip(occupancy, 0.0, 1.0 - eps)
    if logsum:
        log_t = jnp.log1p(-o)
        # exclusive cumsum along z
        csum = jnp.cumsum(log_t, axis=1)
        excl = jnp.concatenate(
            [jnp.zeros_like(csum[:, :1]), csum[:, :-1]], axis=1
        )
        trans = jnp.exp(excl)
        total = jnp.exp(csum[:, -1])
    else:
        t = 1.0 - o
        cprod = jnp.cumprod(t, axis=1)
        trans = jnp.concatenate(
            [jnp.ones_like(cprod[:, :1]), cprod[:, :-1]], axis=1
        )
        total = cprod[:, -1]
    return o * trans, total


def drc_projection(
    occupancy: jax.Array,
    logsum: bool = False,
    with_depth: bool = False,
    depth_values: jax.Array | None = None,
    background_depth: float = 1.0,
) -> tuple[jax.Array, jax.Array | None]:
    """-> (silhouette [B, Y, X], expected depth [B, Y, X] or None).

    ``depth_values`` [Z] are per-slab metric depths (defaults to slab centers
    in NDC depth, i.e. ((i + 0.5)/Z - 0.5)); ``background_depth`` is assigned
    to rays that exit the volume (d_far).
    """
    p_stop, total_trans = drc_event_probabilities(occupancy, logsum=logsum)
    silhouette = 1.0 - total_trans
    depth = None
    if with_depth:
        Z = occupancy.shape[1]
        if depth_values is None:
            depth_values = (
                (jnp.arange(Z, dtype=occupancy.dtype) + 0.5) / Z - 0.5
            )
        depth = (
            jnp.einsum("bzyx,z->byx", p_stop, depth_values)
            + background_depth * total_trans
        )
    return silhouette, depth


def sum_projection(occupancy: jax.Array) -> tuple[jax.Array, None]:
    """Flag-gated simple projection: clipped sum over depth (the reference's
    non-DRC proj mode)."""
    return jnp.clip(jnp.sum(occupancy, axis=1), 0.0, 1.0), None
