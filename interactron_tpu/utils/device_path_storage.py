"""Device-resident policy path storage.

The reference's PathStorage (storage_utils.py:25-50) is a host-side prefix
tree over 4-action paths keyed by episode. On TPU that tree flattens into
two arrays: with 4 actions and depth 4 there are 1+4+16+64 = 85 prefix
nodes, indexed

    node(d=0) = 0
    node(d=1) = 1  + a0
    node(d=2) = 5  + 4*a0 + a1
    node(d=3) = 21 + 16*a0 + 4*a1 + a2

`add_path(path, reward)` lowers to a masked scatter-min over the 4 prefix
nodes and `get_label` to a gather of the stored best actions AFTER the
update — exactly the reference ordering (add then label,
interactron.py:113-115) with zero host round trips. This replaces an
io_callback design that the axon PJRT backend cannot execute (host
send/recv callbacks unimplemented) and whose ordered effects blew up the
TPU compile.

State: {"cost": (N, 85) f32 (+inf init), "action": (N, 85) i32} for N
distinct episode uids.
"""

import jax.numpy as jnp

NUM_NODES = 85
_OFFSETS = (0, 1, 5, 21)
_INF = 1e30


def init_path_state(num_episodes):
    return {
        "cost": jnp.full((num_episodes, NUM_NODES), _INF, jnp.float32),
        "action": jnp.zeros((num_episodes, NUM_NODES), jnp.int32),
    }


def _prefix_nodes(actions):
    """actions: (..., 4) int32 -> (..., 4) node indices of the path's
    prefixes (depths 0..3)."""
    a0, a1, a2 = actions[..., 0], actions[..., 1], actions[..., 2]
    n0 = jnp.zeros_like(a0)
    n1 = 1 + a0
    n2 = 5 + 4 * a0 + a1
    n3 = 21 + 16 * a0 + 4 * a1 + a2
    return jnp.stack([n0, n1, n2, n3], axis=-1)


def update_and_label(state, uids, actions, rewards):
    """Vectorized add_path + get_label for a batch of episodes.

    Args:
      state: path state dict.
      uids: (B,) int32 episode ids (rows).
      actions: (B, 4) int32 taken path.
      rewards: (B,) f32 ground-truth adaptation loss (the "ifga").

    Returns:
      (new_state, labels (B, 4) int32) — labels read after the update, like
      the reference's add_path-then-get_label.
    """
    nodes = _prefix_nodes(actions)  # (B, 4)
    rows = jnp.broadcast_to(uids[:, None], nodes.shape)
    costs = state["cost"][rows, nodes]
    acts = state["action"][rows, nodes]
    better = rewards[:, None] < costs
    new_cost = jnp.where(better, rewards[:, None], costs)
    new_action = jnp.where(better, actions, acts)
    cost = state["cost"].at[rows, nodes].set(new_cost)
    action = state["action"].at[rows, nodes].set(new_action)
    return {"cost": cost, "action": action}, new_action
