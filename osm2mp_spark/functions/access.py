"""Transport-access flag vectors (SURVEY §2.9, lib/TransportAccess.pm).

8 transport classes in the reference's canonical order
(cfg/settings-access.yml transport_types): emergency, delivery, car, bus,
taxi, foot, bike, truck. A flag of 1 means FORBIDDEN for that class
(the reference's acc mask convention). Represented as an int bitmask,
bit i = class i; all ops are Column expressions (codegen).

Tag table and yes/no vocabulary mirror cfg/settings-access.yml verbatim;
evaluation order is the config order (TransportAccess.pm:86-103 iterates
the tag list in declaration order, later tags overwrite their mask bits).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

TRANSPORT_CLASSES = [
    "emergency", "delivery", "car", "bus", "taxi", "foot", "bike", "truck",
]

# (tag, mask, inverted) in cfg/settings-access.yml declaration order.
# mask bits: 0 emergency, 1 delivery, 2 car, 3 bus, 4 taxi, 5 foot,
# 6 bike, 7 truck — i.e. val "1,1,1,1,1,0,1,1" (emergency..truck) is
# 0b11011111 here.  inverted=True is the config's `mode: -1`
# (motorroad: value "yes" FORBIDS the masked classes).
TAG_TABLE = [
    ("motorroad",     0b01100000, True),   # foot+bike forbidden when yes
    ("access",        0b11111111, False),
    ("vehicle",       0b11011111, False),  # all but foot
    ("motor_vehicle", 0b10011111, False),  # all but foot+bike
    ("motorcar",      0b10011111, False),
    ("foot",          0b00100000, False),
    ("bicycle",       0b01000000, False),
    ("psv",           0b00011000, False),  # bus + taxi
    ("bus",           0b00001000, False),
    ("taxi",          0b00010000, False),
    ("hgv",           0b10000000, False),
    ("goods",         0b00000010, False),
    ("emergency",     0b00000001, False),
]

TAG_MASKS = {tag: mask for tag, mask, _ in TAG_TABLE}

# cfg/settings-access.yml `yesno` table: value → access granted (1) or
# denied (0).  Forbidden-flag = 1 - granted for normal tags.  Unknown
# values are SKIPPED (tag has no effect), matching TransportAccess.pm:94-95.
_YESNO = {
    "1": True, "yes": True, "true": True, "designated": True,
    "permissive": True,
    "0": False, "no": False, "false": False, "private": False,
    "restricted": False, "destination": False,
}

_ALLOW_VALUES = [k for k, granted in _YESNO.items() if granted]
_FORBID_VALUES = [k for k, granted in _YESNO.items() if not granted]


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
    """Map<string,string> tags → forbidden-class bitmask, replaying
    TransportAccess.pm get_tag_flags: iterate the config tag list in
    order; for each tag present with a yesno-mapped value, SET the masked
    positions to the forbidden flag (overwriting earlier tags)."""
    # linear fold: each step references the running mask ONCE —
    # (mask | forbid_bits) & ~allow_bits — so the Catalyst expression grows
    # linearly in the tag count (a when/when/otherwise nesting would copy
    # the running mask 3× per tag → 3^n blowup)
    mask = F.lit(0)
    for tag, m, inverted in TAG_TABLE:
        v = tags_col.getItem(tag)
        forbid_vals = _ALLOW_VALUES if inverted else _FORBID_VALUES
        allow_vals = _FORBID_VALUES if inverted else _ALLOW_VALUES
        forbid = v.isin(forbid_vals)
        allow = v.isin(allow_vals)
        forbid_bits = F.when(forbid, F.lit(m)).otherwise(F.lit(0))
        keep_bits = F.when(allow, F.lit(0xFF ^ m)).otherwise(F.lit(0xFF))
        mask = mask.bitwiseOR(forbid_bits).bitwiseAND(keep_bits)
    return mask


# MPC writer widens the 8 mp flags to 10 (WriterMPC.pm:370-375):
#   mp:  emergency,delivery,car,bus,taxi,foot,bike,truck
#   mpc: Automobiles,Buses,Taxis,Carpools,Pedestrians,Bicycles,Trucks,
#        ThroughTraffic,Deliveries,EmergencyVehicles
# i.e. Perl slice [2,3,4,9,5,6,7,9,1,0] where index 9 is past the 8-element
# list → undef → 0 (the `// 0` default): Carpools and Through Traffic are
# always 0.  None marks those constant-zero slots.
MPC_ORDER = [2, 3, 4, None, 5, 6, 7, None, 1, 0]


def reorder_for_mpc(flags_array: Column) -> Column:
    return F.array(
        *[
            F.lit(0) if i is None else F.element_at(flags_array, i + 1)
            for i in MPC_ORDER
        ]
    )
