"""On-device diversity vote across time-aligned channels.

Device-side counterpart of the softCombiner's N-way weighted majority
vote (reference ``softCombiner.py:570-618``): bits whose trust is
negative are disqualified, each remaining channel votes with weight
``|trust|`` (the master channel scaled by ``masterVoteWeight``), and the
combined trust encodes ``votersAgreed + quorum/10`` exactly like the
reference's ``trust = sum(results==vote) + usedVoters/10``.

This path assumes the channel streams are already sample-aligned (true
when the channels are sharded shards of one wideband capture); the host
``combine.SoftCombiner`` handles arbitrarily-delayed streams.
"""

import jax.numpy as jnp


def vote_n_device(bits: jnp.ndarray, trust: jnp.ndarray, master_idx: int = 0,
                  master_weight: float = 1.2):
    """Weighted majority vote over axis 0.

    bits: (C, n) int8 {0,1}; trust: (C, n) int8 (negative = distrust).
    Returns (voted_bits int8[n], combined_trust float32[n]).
    """
    C = bits.shape[0]
    # trust >= 0 qualifies a voter, matching the host path
    # (combine/votes.py); its weight is |trust| (0-weight voters still
    # count toward the quorum, like the reference)
    valid = trust >= 0
    w = jnp.where(valid, trust.astype(jnp.float32), 0.0)
    w = w.at[master_idx].multiply(master_weight)

    nrz = bits.astype(jnp.float32) * 2.0 - 1.0
    score = jnp.sum(w * nrz, axis=0)
    voted = (score > 0).astype(jnp.int8)

    agree = jnp.sum(valid & (bits == voted[None, :]), axis=0)
    quorum = jnp.sum(valid, axis=0)
    combined_trust = agree.astype(jnp.float32) + quorum.astype(jnp.float32) / 10.0
    combined_trust = jnp.where(quorum == 0, -1.0, combined_trust)
    return voted, combined_trust
