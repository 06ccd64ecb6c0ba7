"""Priority-score kernels shared by the Spark engine and the oracle.

Hostname-balancing decay score — /root/reference/lib/RedisUrlList.js:25-53
(`zaddwithdelay` Lua): on each fresh insert for host h at time t,

    delay = delay * exp(ln(1/2) * (t - last_update) / half_life) + 1
    score = delay;  last_update = t

so hosts that flood the queue see their new URLs drain later, while fresh
scores (small counts) always sort before epoch-ms retry/recrawl scores —
fair cross-host interleaving for free.
"""

from __future__ import annotations

import math

LN_HALF = math.log(0.5)


def decay_step(delay: float, last_update: float, t: float,
               half_life_ms: float) -> tuple[float, float]:
    """One insert: returns (new_delay == score, new_last_update)."""
    decayed = delay * math.exp(LN_HALF * (t - last_update) / half_life_ms)
    return decayed + 1.0, t


def decay_scores(inserts, state: dict, half_life_ms: float) -> list[float]:
    """Sequential scores for ordered ``inserts`` = [(host, t_ms), ...],
    mutating ``state``: host → (delay, last_update)."""
    out = []
    for host, t in inserts:
        delay, last = state.get(host, (0.0, t))
        score, last = decay_step(delay, last, t, half_life_ms)
        state[host] = (score, last)
        out.append(score)
    return out
