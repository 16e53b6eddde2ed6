"""Transport-access flag vectors (SURVEY §2.9, lib/TransportAccess.pm).

8 transport classes in the reference's canonical order
(cfg/settings-access.yml transport_types): emergency, delivery, car, bus,
taxi, foot, bike, truck. A flag of 1 means FORBIDDEN for that class
(the reference's acc mask convention). Represented as an int bitmask,
bit i = class i; all ops are Column expressions (codegen).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

TRANSPORT_CLASSES = [
    "emergency", "delivery", "car", "bus", "taxi", "foot", "bike", "truck",
]

# tag → affected-class mask, the Column-side analog of the reference's
# per-tag mask table (TransportAccess.pm:83-104 semantics, values ours).
# bits: 0 emergency, 1 delivery, 2 car, 3 bus, 4 taxi, 5 foot, 6 bike, 7 truck
TAG_MASKS = {
    "motor_vehicle": 0b10011110,  # delivery car bus taxi truck
    "vehicle": 0b11011110,  # motor_vehicle + bike
    "foot": 0b00100000,
    "bicycle": 0b01000000,
    "hgv": 0b10000000,
    "psv": 0b00011000,  # bus + taxi
    "access": 0b11111111,
}

_YESNO = {"no": True, "private": True, "yes": False, "permissive": False,
          "designated": False}


def mask_to_array(mask_col: Column) -> Column:
    """int bitmask → array<int> of 0/1 in canonical class order (the
    serialized CSV vector of TransportAccess.pm:133-138)."""
    return F.array(
        *[
            F.shiftright(mask_col, i).bitwiseAND(F.lit(1))
            for i in range(len(TRANSPORT_CLASSES))
        ]
    )


def merge_masks(*mask_cols: Column) -> Column:
    """OR-combine restriction masks (area override J5 / tag stacking)."""
    out = mask_cols[0]
    for c in mask_cols[1:]:
        out = out.bitwiseOR(c)
    return out


def tag_access_mask(tags_col: Column) -> Column:
    """Map<string,string> tags → forbidden-class bitmask: for each known
    access tag present, its class mask is applied when the value means
    'no', cleared when it means 'yes' (later / more specific tags win by
    the iteration order below — generic `access` first, specific last,
    mirroring the reference's specificity order)."""
    # linear fold: each step references the running mask ONCE —
    # (mask | forbid_bits) & ~allow_bits — so the Catalyst expression grows
    # linearly in the tag count (a when/when/otherwise nesting would copy
    # the running mask 3× per tag → 3^n blowup)
    mask = F.lit(0)
    for tag in ["access", "vehicle", "motor_vehicle", "psv", "hgv", "bicycle", "foot"]:
        v = tags_col.getItem(tag)
        forbid = v.isin([k for k, no in _YESNO.items() if no])
        allow = v.isin([k for k, no in _YESNO.items() if not no])
        m = TAG_MASKS[tag]
        forbid_bits = F.when(forbid, F.lit(m)).otherwise(F.lit(0))
        keep_bits = F.when(allow, F.lit(0xFF ^ m)).otherwise(F.lit(0xFF))
        mask = mask.bitwiseOR(forbid_bits).bitwiseAND(keep_bits)
    return mask


# MPC writer reorders the 8 flags (WriterMPC.pm:370-375) — a fixed index
# permutation, expressed as an array shuffle
MPC_ORDER = [2, 1, 0, 3, 4, 7, 5, 6]


def reorder_for_mpc(flags_array: Column) -> Column:
    return F.array(*[F.element_at(flags_array, i + 1) for i in MPC_ORDER])
