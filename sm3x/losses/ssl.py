"""Stage-1 SSL loss assembly.

Reproduces the style-dependent weighting of the reference train loop
(/root/reference/tools/backbone_train.py:98-121):

  style 0 (v3/v32):     cross = 0.5*L(cd1, cc1) + 0.5*L(cd2, cc2)
  style 1 (v311/v321):  cross = 0.5*L(cd1, cc2) + 0.5*L(cd2, cc1)
  style 2 (v312/v322):  cross = 0.25 * sum over all 4 view pairs
  total = L_derm + L_clinic + cross

`groups` reproduces DDP's per-device negatives (SURVEY §2c): the
reference never gathers features across ranks, so NT-Xent negatives are
local to each device's sub-batch. groups = reference world_size gives
loss-scale parity; groups=1 contrasts globally.
"""

from __future__ import annotations

import jax.numpy as jnp

from sm3x.ops.ntxent import grouped_ntxent_loss


def ssl_loss(
    outputs: dict,
    style: int,
    temperature: float,
    groups: int = 1,
    modality_weights=(1.0, 1.0),
    use_pallas: bool = False,
    local_weight: float = 1.0,
):
    """outputs: the dict returned by SimCLRSkinV3/V32.__call__ (or
    .multicrop, which adds derm_local_z/clinic_local_z tuples — each local
    view then contributes an NT-Xent against global view 1 of its
    modality, averaged over views and weighted by `local_weight`).
    Returns (total, {"derm": .., "clinic": .., "cross": .., ["local"]}).
    `use_pallas` routes each group's NT-Xent through the fused Pallas TPU
    kernel (sm3x.ops.ntxent_pallas) instead of the XLA composition."""
    b2 = outputs["derm_z"].shape[0]
    b = b2 // 2

    if use_pallas:
        # fused dispatcher: Pallas kernel on TPU, the (numerically
        # equivalent) XLA composition on other backends — so
        # --use-pallas-ntxent still runs on the CPU backend
        from sm3x.ops.ntxent_pallas import ntxent_loss_fused

        def nt(z1, z2):
            if groups == 1:
                return ntxent_loss_fused(z1, z2, temperature)
            gb = z1.shape[0] // groups
            losses = [
                ntxent_loss_fused(z1[g * gb:(g + 1) * gb],
                                  z2[g * gb:(g + 1) * gb], temperature)
                for g in range(groups)
            ]
            return jnp.mean(jnp.stack(losses))
    else:
        def nt(z1, z2):
            return grouped_ntxent_loss(z1, z2, temperature, groups)

    derm_loss = nt(outputs["derm_z"][:b], outputs["derm_z"][b:])
    clinic_loss = nt(outputs["clinic_z"][:b], outputs["clinic_z"][b:])

    cd = outputs["cross_derm_z"]
    cc = outputs["cross_clinic_z"]
    if style == 0:
        cross = 0.5 * nt(cd[0], cc[0]) + 0.5 * nt(cd[1], cc[1])
    elif style == 1:
        cross = 0.5 * nt(cd[0], cc[1]) + 0.5 * nt(cd[1], cc[0])
    elif style == 2:
        cross = 0.25 * (
            nt(cd[0], cc[0]) + nt(cd[0], cc[1]) + nt(cd[1], cc[0]) + nt(cd[1], cc[1])
        )
    else:
        raise ValueError(f"style must be 0/1/2, got {style}")

    total = modality_weights[0] * derm_loss + modality_weights[1] * clinic_loss + cross
    parts = {"derm": derm_loss, "clinic": clinic_loss, "cross": cross}

    locals_d = outputs.get("derm_local_z", ())
    locals_c = outputs.get("clinic_local_z", ())
    if locals_d or locals_c:
        terms = [nt(lz, outputs["derm_z"][:b]) for lz in locals_d]
        terms += [nt(lz, outputs["clinic_z"][:b]) for lz in locals_c]
        local = jnp.mean(jnp.stack(terms))
        parts["local"] = local
        total = total + local_weight * local
    return total, parts
