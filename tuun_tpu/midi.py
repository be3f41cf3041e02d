"""MIDI input classifier: raw MIDI messages -> pure Actions.

The TPU build's counterpart of /root/reference/src/lib/midi_input.rs,
minus the Launchkey hardware driver (launchkey.rs talks midir/SysEx to a
specific controller; here any source of standard MIDI bytes — a file, a
network stream, a virtual port — feeds `classify`).  The event mapping
mirrors the reference:

  * note on / note off          -> NoteOn / NoteOff (note-on velocity 0
                                   is a note-off, per the MIDI spec)
  * CC 21..28 ("encoders")      -> SetSliderNormalized on the active
                                   program (absolute 0..127 -> 0..1)
  * CC 7 (channel volume)       -> SetLevelDb on the active program
                                   (0..127 -> -60..+6 dB, the reference
                                   mixer-encoder range)
  * program change              -> SelectProgram (bank-relative)
  * CC 115/116 (transport prev/next used as track keys) -> AdvanceProgram

`classify_bytes` accepts a raw status/data message; `classify` takes a
decoded (kind, a, b) event for callers that already parse framing.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from . import actions as A
from .programs import PROGRAMS_PER_BANK

# CC numbers: 21-28 are the common "user knob" block (Launchkey,
# MiniLab, nanoKONTROL all land here in their default maps).
SLIDER_CCS = range(21, 29)
CC_VOLUME = 7
CC_PREV_TRACK = 115
CC_NEXT_TRACK = 116

LEVEL_DB_MIN, LEVEL_DB_MAX = -60.0, 6.0


def decode(status: int, data1: int, data2: int
           ) -> Optional[Tuple[str, int, int]]:
    """Raw MIDI message -> (kind, a, b) event, or None for unhandled
    kinds (aftertouch, pitch bend, system messages)."""
    kind = status & 0xF0
    if kind == 0x90:
        if data2 == 0:  # running-status note-off
            return ("note_off", data1, 0)
        return ("note_on", data1, data2)
    if kind == 0x80:
        return ("note_off", data1, data2)
    if kind == 0xB0:
        return ("cc", data1, data2)
    if kind == 0xC0:
        return ("program_change", data1, 0)
    return None


def classify(state: A.AppState, event: Tuple[str, int, int]
             ) -> List[object]:
    """Decoded MIDI event -> Actions against the current app state."""
    kind, a, b = event
    i = state.active_program_index

    if kind == "note_on":
        if b == 0:  # velocity-0 note-on IS a note-off (MIDI spec)
            return [A.NoteOff(key=a)]
        return [A.NoteOn(key=a, velocity=b)]
    if kind == "note_off":
        return [A.NoteOff(key=a)]

    if kind == "program_change":
        index = state.bank_start() + a
        if a < PROGRAMS_PER_BANK and index < len(state.programs.programs):
            return [A.SelectProgram(index)]
        return []

    if kind == "cc":
        if a in SLIDER_CCS:
            slider_index = a - SLIDER_CCS.start
            program = state.programs.programs[i]
            if slider_index >= len(program.sliders.configs):
                return []
            return [A.SetSliderNormalized(i, slider_index, b / 127.0)]
        if a == CC_VOLUME:
            level = LEVEL_DB_MIN + (b / 127.0) * (LEVEL_DB_MAX
                                                  - LEVEL_DB_MIN)
            return [A.SetLevelDb(i, level)]
        if a == CC_PREV_TRACK and b > 0:
            return [A.AdvanceProgram(-1)]
        if a == CC_NEXT_TRACK and b > 0:
            return [A.AdvanceProgram(1)]
        return []

    return []


def classify_bytes(state: A.AppState, status: int, data1: int = 0,
                   data2: int = 0) -> List[object]:
    """Raw MIDI bytes -> Actions (decode + classify)."""
    event = decode(status, data1, data2)
    if event is None:
        return []
    return classify(state, event)
