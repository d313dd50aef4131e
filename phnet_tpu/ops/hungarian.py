"""On-device Hungarian (linear sum assignment).

The reference solves the label-assignment LP with
``scipy.optimize.linear_sum_assignment`` **on the CPU** for every
frame x stage x branch (``libs/utils/dynamic_assign.py:241-243``) — a
GPU->CPU->GPU round trip in the middle of each training step. Here we run the
same Jonker-Volgenant shortest-augmenting-path algorithm as fixed-shape JAX
loops so assignment stays on the TPU and inside the jitted train step.

Shapes: cost is ``[n_targets, n_priors]`` with n_targets tiny (<= max_lanes,
static) and n_priors = 240, so each augmentation is one Dijkstra sweep with
vectorized argmin over 240 entries — negligible work, zero host sync.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

BIG = jnp.float32(1e9)


@partial(jax.jit, static_argnames=())
def hungarian_assign(cost: jnp.ndarray, row_valid: jnp.ndarray) -> jnp.ndarray:
    """Minimum-cost assignment of each valid row to a distinct column.

    Args:
      cost: ``[R, C]`` float cost, R (targets) <= C (priors).
      row_valid: ``[R]`` bool; invalid rows get an arbitrary distinct column
        (their cost row is replaced by a constant, which provably does not
        perturb the optimum of the valid sub-assignment).

    Returns:
      ``col4row``: ``[R]`` int32, the matched column of each row
      (meaningless where ``row_valid`` is False).
    """
    r, c = cost.shape
    cost = jnp.where(row_valid[:, None], cost, 0.0).astype(jnp.float32)

    u0 = jnp.zeros((r,), jnp.float32)
    v0 = jnp.zeros((c,), jnp.float32)
    col4row0 = jnp.full((r,), -1, jnp.int32)
    row4col0 = jnp.full((c,), -1, jnp.int32)

    inf = jnp.float32(jnp.inf)

    def augment(cur_row, state):
        u, v, col4row, row4col = state
        # Dijkstra from cur_row over columns until an unassigned column.
        shortest = jnp.full((c,), inf)
        path = jnp.full((c,), -1, jnp.int32)  # predecessor row per column
        visited = jnp.zeros((c,), bool)  # SC: scanned columns
        row_scanned = jnp.zeros((r,), bool)  # SR

        def cond(carry):
            _, _, _, _, _, sink, _ = carry
            return sink < 0

        def body(carry):
            shortest, path, visited, row_scanned, i, sink, min_val = carry
            row_scanned = row_scanned.at[i].set(True)
            reduced = min_val + cost[i] - u[i] - v  # [c]
            better = (reduced < shortest) & ~visited
            shortest = jnp.where(better, reduced, shortest)
            path = jnp.where(better, i, path)
            # pick the unvisited column with minimal shortest-path cost
            masked = jnp.where(visited, inf, shortest)
            j = jnp.argmin(masked).astype(jnp.int32)
            min_val = masked[j]
            visited = visited.at[j].set(True)
            nxt = row4col[j]
            sink = jnp.where(nxt < 0, j, jnp.int32(-1))
            i = jnp.where(nxt < 0, i, nxt)
            return shortest, path, visited, row_scanned, i, sink, min_val

        init = (shortest, path, visited, row_scanned, cur_row, jnp.int32(-1),
                jnp.float32(0.0))
        shortest, path, visited, row_scanned, _, sink, min_val = jax.lax.while_loop(
            cond, body, init
        )

        # update dual potentials (scipy _lsap.c semantics)
        u = u.at[cur_row].add(min_val)
        u = jnp.where(
            row_scanned & (jnp.arange(r) != cur_row),
            u + min_val - shortest[col4row_safe(col4row)],
            u,
        )
        v = jnp.where(visited, v + shortest - min_val, v)

        # augment along the alternating path ending at `sink`
        def flip_cond(carry):
            _, _, j, done = carry
            return ~done

        def flip_body(carry):
            col4row, row4col, j, _ = carry
            i = path[j]
            row4col = row4col.at[j].set(i)
            prev_j = col4row[i]
            col4row = col4row.at[i].set(j)
            done = i == cur_row
            return col4row, row4col, prev_j, done

        col4row, row4col, _, _ = jax.lax.while_loop(
            flip_cond, flip_body, (col4row, row4col, sink, jnp.array(False))
        )
        return u, v, col4row, row4col

    def col4row_safe(col4row):
        return jnp.clip(col4row, 0, c - 1)

    state = (u0, v0, col4row0, row4col0)
    state = jax.lax.fori_loop(0, r, augment, state)
    _, _, col4row, _ = state
    return col4row
