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
scipy in tests/test_ops.py.
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


def _solve_rows_bounded(cost, k):
    """JV over the first `k` rows of an n x n cost matrix (k is a traced
    scalar; rows >= k are never augmented). Returns row_to_col: (n,) int32 —
    for each row < k its assigned column; other entries meaningless.

    The augmentation count is the WHOLE cost of this solver (each row is a
    sequential shortest-path while_loop of ~10 tiny kernels per step), so
    bounding it by the real target count — typically 3-10 of the 50 padded
    slots — is an order-of-magnitude latency win over augmenting every row.
    Under vmap the bound is the batch max (lax.while_loop batching freezes
    finished lanes)."""
    n = cost.shape[0]
    cost_pad = jnp.zeros((n + 1, n + 1), jnp.float32).at[1:, 1:].set(
        cost.astype(jnp.float32)
    )

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

    def outer_cond(carry):
        return carry[4] <= k

    def outer_body(carry):
        u, v, p, way, i = carry
        u, v, p, way = assign_row(i, (u, v, p, way))
        return (u, v, p, way, i + 1)

    u = jnp.zeros((n + 1,), jnp.float32)
    v = jnp.zeros((n + 1,), jnp.float32)
    p = jnp.zeros((n + 1,), jnp.int32)
    way = jnp.zeros((n + 1,), jnp.int32)
    u, v, p, way, _ = jax.lax.while_loop(
        outer_cond, outer_body, (u, v, p, way, jnp.int32(1))
    )
    # p[j] = 1-based row assigned to column j; invert to row_to_col
    # (negative scatter indices are out of bounds and dropped)
    cols = jnp.arange(n + 1, dtype=jnp.int32)
    return jnp.zeros((n,), jnp.int32).at[p - 1].set(cols - 1, mode="drop")


@partial(jax.jit, static_argnames=())
def solve_padded(cost, col_valid):
    """LSA on a padded cost matrix.

    Args:
      cost: (n, n) float, rows = queries, cols = targets; only columns with
        col_valid True are real targets.
      col_valid: (n,) bool.

    Returns:
      col_to_row: (n,) int32 — for each column (valid or not) the assigned
        row; entries at invalid columns are meaningless and must be masked by
        the caller.

    Solves the TRANSPOSED problem (rows = targets) so the sequential
    augmentation count is the number of VALID targets, not the query count:
    identical to scipy's rectangular `linear_sum_assignment` on the valid
    submatrix, since each valid target gets an optimal distinct query and
    padded columns are unconstrained.
    """
    n = cost.shape[0]
    # valid target columns first (stable), remember how to undo
    order = jnp.argsort(jnp.logical_not(col_valid), stable=True)
    ct = cost.astype(jnp.float32).T[order]  # (targets sorted, queries)
    k = jnp.sum(col_valid).astype(jnp.int32)
    row_to_col = _solve_rows_bounded(ct, k)
    inv = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return row_to_col[inv]


batched_solve_padded = jax.jit(jax.vmap(solve_padded))
