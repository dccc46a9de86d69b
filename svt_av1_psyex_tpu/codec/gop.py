"""Hierarchical GOP planning: dyadic mini-GOPs with backward references.

Counterpart: the reference's picture-decision process
(picture_decision_process.c: mini-GOP construction, pred structure
PRED_RANDOM_ACCESS) reduced to its dyadic core: an anchor chain at layer 0
plus B-layers referencing past (LAST) and future (BWDREF/ALTREF) anchors,
emitted in coded order with show_existing_frame for the delayed anchor.

Slots: 0 = last key/anchor ("LAST pool"), 1 = mini-GOP future anchor
(ALTREF), 2 = mid frame (BWDREF). Per-layer qindex offsets follow the
reference's hierarchical ladder shape.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# named reference indices (spec): LAST=1 ... ALTREF=7
LAST, LAST2, LAST3, GOLDEN, BWDREF, ALTREF2, ALTREF = 1, 2, 3, 4, 5, 6, 7


@dataclass
class FramePlan:
    disp_idx: int
    frame_type: int  # 0 KEY, 1 INTER
    show_frame: bool = True
    show_existing_slot: int | None = None  # emit show_existing TU instead
    refs: dict = field(default_factory=dict)  # ref name (1..7) -> slot
    refresh_flags: int = 0
    primary_ref_name: int | None = None  # named ref carrying the CDFs
    layer: int = 0
    q_offset: int = 0


# per-layer qindex offsets (hierarchical ladder shape; anchors lowest)
_LAYER_QOFF = [0, 10, 16, 20]


def plan_minigop(anchor_slot: int, start_disp: int, length: int,
                 future_slot: int, mid_slot: int) -> list[FramePlan]:
    """Coded-order plans for one dyadic mini-GOP of `length` (1, 2 or 4)
    displayed frames start_disp .. start_disp+length-1, referencing the
    anchor in `anchor_slot`."""
    if length == 1:
        return [FramePlan(start_disp, 1, True,
                          refs={LAST: anchor_slot, ALTREF: anchor_slot},
                          refresh_flags=0xFF ^ 0,  # becomes the next anchor
                          primary_ref_name=LAST, layer=0,
                          q_offset=_LAYER_QOFF[0])]
    # shown frames must be emitted in display order (AV1 has no output
    # reordering); every out-of-order frame is coded no-show and displayed
    # later via show_existing_frame
    plans = []
    d = start_disp
    if length == 2:
        plans.append(FramePlan(d + 1, 1, False,
                               refs={LAST: anchor_slot, ALTREF: anchor_slot},
                               refresh_flags=1 << future_slot,
                               primary_ref_name=LAST, layer=0,
                               q_offset=_LAYER_QOFF[0]))
        plans.append(FramePlan(d, 1, True,
                               refs={LAST: anchor_slot, ALTREF: future_slot},
                               refresh_flags=0,
                               primary_ref_name=LAST, layer=1,
                               q_offset=_LAYER_QOFF[1]))
        plans.append(FramePlan(d + 1, 1, show_existing_slot=future_slot))
        return plans
    assert length == 4
    plans.append(FramePlan(d + 3, 1, False,
                           refs={LAST: anchor_slot, ALTREF: anchor_slot},
                           refresh_flags=1 << future_slot,
                           primary_ref_name=LAST, layer=0,
                           q_offset=_LAYER_QOFF[0]))
    plans.append(FramePlan(d + 1, 1, False,
                           refs={LAST: anchor_slot, ALTREF: future_slot},
                           refresh_flags=1 << mid_slot,
                           primary_ref_name=LAST, layer=1,
                           q_offset=_LAYER_QOFF[1]))
    plans.append(FramePlan(d, 1, True,
                           refs={LAST: anchor_slot, BWDREF: mid_slot,
                                 ALTREF: future_slot},
                           refresh_flags=0,
                           primary_ref_name=LAST, layer=2,
                           q_offset=_LAYER_QOFF[2]))
    plans.append(FramePlan(d + 1, 1, show_existing_slot=mid_slot))
    plans.append(FramePlan(d + 2, 1, True,
                           refs={LAST: mid_slot, ALTREF: future_slot},
                           refresh_flags=0,
                           primary_ref_name=LAST, layer=2,
                           q_offset=_LAYER_QOFF[2]))
    plans.append(FramePlan(d + 3, 1, show_existing_slot=future_slot))
    return plans


def plan_key(disp_idx: int) -> FramePlan:
    return FramePlan(disp_idx, 0, True, refresh_flags=0xFF,
                     primary_ref_name=None, layer=0, q_offset=0)
