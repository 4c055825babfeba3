"""On-device batched Hungarian assignment (linear sum assignment).

Replaces the reference's device->host sync into scipy's C LAP solver
(detr_models/matcher.py:73-76) with a Jonker-Volgenant shortest-augmenting-path
solver written in `lax` control flow, so matching stays on-chip, inside jit,
and vmaps across the (episodes x frames) batch.

The solver works on square n x n matrices. Ragged target sets are padded to a
fixed column count with a constant cost: because every padded column has the
same cost in every row, the optimal assignment restricted to valid columns is
identical to scipy's rectangular `linear_sum_assignment` on the valid
submatrix (the padded part contributes a constant), which is verified against
scipy in tests/test_hungarian.py.
"""

from functools import partial

import jax
import jax.numpy as jnp

_PAD_COST = 1e4
# python literal, NOT jnp: a module-level device constant would be created
# on the default device at import and fetched back during every lowering
# (minutes through the axon tunnel)
_INF = 1e18


def solve_square(cost):
    """Solve an n x n linear sum assignment problem.

    Args:
      cost: (n, n) float array; cost[i, j] = cost of assigning row i to col j.

    Returns:
      col_to_row: (n,) int32; col_to_row[j] = row assigned to column j.
    """
    n = cost.shape[0]
    cost = cost.astype(jnp.float32)
    # 1-based padding: row/col 0 are virtual (the JV "free" sentinels).
    cost_pad = jnp.zeros((n + 1, n + 1), jnp.float32).at[1:, 1:].set(cost)

    def assign_row(i, carry):
        u, v, p, way = carry
        p = p.at[0].set(i)
        minv = jnp.full((n + 1,), _INF)
        used = jnp.zeros((n + 1,), jnp.bool_)
        used_rows = jnp.zeros((n + 1,), jnp.bool_)
        j0 = jnp.int32(0)

        def path_body(state):
            u, v, p, way, (minv, used, used_rows), j0 = state
            used = used.at[j0].set(True)
            i0 = p[j0]
            # track the set of rows on the alternating tree incrementally so
            # the dual update u[p[j]] += delta needs no scatter (keeps the
            # Mosaic compile fast)
            used_rows = used_rows.at[i0].set(True)
            cur = cost_pad[i0] - u[i0] - v
            upd = jnp.logical_and(~used, cur < minv)
            minv = jnp.where(upd, cur, minv)
            way = jnp.where(upd, j0, way)
            masked = jnp.where(used, _INF, minv)
            j1 = jnp.argmin(masked).astype(jnp.int32)
            delta = masked[j1]
            u = u + jnp.where(used_rows, delta, 0.0)
            v = v - jnp.where(used, delta, 0.0)
            minv = minv - jnp.where(used, 0.0, delta)
            return (u, v, p, way, (minv, used, used_rows), j1)

        def cond(state):
            p, j0 = state[2], state[5]
            return p[j0] != 0

        state = (u, v, p, way, (minv, used, used_rows), j0)
        # First expansion must always run: p[0] = i != 0, so cond is true.
        state = jax.lax.while_loop(cond, path_body, state)
        u, v, p, way, _, j0 = state

        def aug_cond(s):
            _, j0 = s
            return j0 != 0

        def aug_body(s):
            p, j0 = s
            j1 = way[j0]
            p = p.at[j0].set(p[j1])
            return (p, j1)

        p, _ = jax.lax.while_loop(aug_cond, aug_body, (p, j0))
        return (u, v, p, way)

    u = jnp.zeros((n + 1,), jnp.float32)
    v = jnp.zeros((n + 1,), jnp.float32)
    p = jnp.zeros((n + 1,), jnp.int32)
    way = jnp.zeros((n + 1,), jnp.int32)
    u, v, p, way = jax.lax.fori_loop(1, n + 1, assign_row, (u, v, p, way))
    return p[1:] - 1  # back to 0-based rows


@partial(jax.jit, static_argnames=())
def solve_padded(cost, col_valid):
    """LSA on a padded cost matrix.

    Args:
      cost: (n, n) float; only columns with col_valid True are real targets.
      col_valid: (n,) bool.

    Returns:
      col_to_row: (n,) int32 — for each column (valid or not) the assigned
        row; entries at invalid columns are meaningless and must be masked by
        the caller.
    """
    c = jnp.where(col_valid[None, :], cost.astype(jnp.float32), _PAD_COST)
    return solve_square(c)


batched_solve_padded = jax.jit(jax.vmap(solve_padded))
