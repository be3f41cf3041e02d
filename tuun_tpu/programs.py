"""Source-file program model.

Port of the batch-relevant parts of /root/reference/src/lib/programs.rs:
a .tuun source file is a module whose *annotated* bindings are UI programs,
laid out in source order into 8 banks x 8 slots (with `skip_slots` gaps).
Each program carries its text, slider configs (with normalized positions),
color and level; evaluation context is the file's preceding bindings minus
`_` definitions plus the slider bindings.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

from . import parser
from .diagnostics import Source
from .expr import (ALevel, ASkipSlots, ASliders, AColor, BDef, BOpen,
                   PIdent, Slider, SliderLinear, SliderUserDefined,
                   SourceBinding, TuunError)
from .ids import MarkId
from .sliders import append_slider_bindings

NUM_PROGRAM_BANKS = 8
PROGRAMS_PER_BANK = 8


@dataclass
class ProgramSliders:
    configs: List[Slider] = field(default_factory=list)
    normalized_values: List[float] = field(default_factory=list)

    @staticmethod
    def from_configs(configs: Sequence[Slider]) -> "ProgramSliders":
        normalized = []
        for c in configs:
            if isinstance(c.function, SliderLinear):
                f = c.function
                span = f.max - f.min
                normalized.append((f.initial_value - f.min) / span
                                  if span else 0.0)
            elif isinstance(c.function, SliderUserDefined):
                normalized.append(c.function.normalized_initial_value)
            else:
                normalized.append(0.0)
        return ProgramSliders(list(configs), normalized)


@dataclass
class Program:
    text: str
    span: Optional[Tuple[int, int]]
    binding_index: int
    sliders: ProgramSliders = field(default_factory=ProgramSliders)
    color: Optional[Tuple[int, int, int]] = None
    level_db: float = 0.0

    def is_empty(self) -> bool:
        return not self.text.strip()


class ProgramSet:
    """The parsed source file plus its slot-mapped programs."""

    def __init__(self, source: str, bindings: List[SourceBinding],
                 programs: List[Program], input_path: Optional[Path] = None):
        self.source = source
        self.bindings = bindings
        self.programs = programs
        self.input_path = input_path

    @staticmethod
    def from_source(source: str, input_path: Optional[Path] = None,
                    all_bindings: bool = False
                    ) -> Tuple["ProgramSet", str]:
        """Parses the file; annotated bindings become programs
        (programs.rs:529-576). With all_bindings=True every definition is a
        program (for un-annotated corpus files like dtmf.tuun)."""
        bindings, errors = parser.parse_module(source, Source.file())
        message = ""
        if errors:
            more = f" (+{len(errors) - 1} more)" if len(errors) > 1 else ""
            message = f"Parse error: {errors[0].message}{more}"
        total = NUM_PROGRAM_BANKS * PROGRAMS_PER_BANK
        programs: List[Program] = [Program("", None, len(bindings))
                                   for _ in range(total)]
        position = 0
        for binding_index, sb in enumerate(bindings):
            program = _program_from_binding(sb, binding_index, source,
                                            all_bindings)
            if program is None:
                continue
            position += _read_skip_slots(sb)
            if position < total:
                programs[position] = program
            position += 1
        return ProgramSet(source, bindings, programs, input_path), message

    def display_name(self, index: int) -> str:
        bank = index // PROGRAMS_PER_BANK
        slot = index % PROGRAMS_PER_BANK
        return f"{chr(ord('A') + bank)}{slot + 1}"

    def evaluation_bindings(self, index: int) -> List[SourceBinding]:
        """Context for evaluating program `index`: the file's bindings that
        precede it, minus `_` definitions, plus its slider bindings."""
        program = self.programs[index]
        out: List[SourceBinding] = []
        for i, sb in enumerate(self.bindings):
            if i >= program.binding_index:
                break
            if isinstance(sb.binding, BDef) and \
                    isinstance(sb.binding.pattern, PIdent) and \
                    sb.binding.pattern.name == "_":
                continue
            out.append(sb)
        append_slider_bindings(program.sliders.configs,
                               program.sliders.normalized_values,
                               MarkId.slider, out)
        return out


def _program_from_binding(sb: SourceBinding, binding_index: int, source: str,
                          all_bindings: bool) -> Optional[Program]:
    if not sb.annotations and not all_bindings:
        return None
    if not isinstance(sb.binding, BDef):
        return None
    sliders = ProgramSliders()
    color = None
    level_db = 0.0
    for anno in sb.annotations:
        if isinstance(anno, ASliders):
            sliders = ProgramSliders.from_configs(anno.sliders)
        elif isinstance(anno, AColor):
            color = (anno.r, anno.g, anno.b)
        elif isinstance(anno, ALevel):
            level_db = anno.level_db
    e = sb.binding.expr
    if e.span is None or e.span.end > len(source):
        return None
    text = source[e.span.start:e.span.end]
    return Program(text, (e.span.start, e.span.end), binding_index, sliders,
                   color, level_db)


def _read_skip_slots(sb: SourceBinding) -> int:
    for anno in sb.annotations:
        if isinstance(anno, ASkipSlots):
            return anno.count
    return 0
