"""Interactive live-coding REPL.

The TPU build's counterpart of the reference's SDL2 UI loop (actions.rs /
effects.rs / sdl2_input.rs keymap): load a program file, evaluate and play
programs, stop them, install keys instruments, strike/release notes, move
sliders (spliced as click-free ramps into live voices), edit program text
in place, persist annotations, and dump waveform IR.  There is no audio
device in the TPU environment, so time advances explicitly: `render N.N`
renders the next N.N seconds of the mix (optionally to a WAV), which is
where scheduled starts, ramps and note releases actually play out.

Run:  python -m tuun_tpu.repl [file.tuun]
"""

from __future__ import annotations

import shlex
import sys
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from . import eval as eval_mod
from . import ir, optimizer, parser
from .diagnostics import Source
from .evaluator import Evaluator
from .expr import BOpen, EBuiltIn, EFunction, ESeq, EWaveform, SourceBinding, TuunError
from .ids import MarkId, WaveformId
from .player import Player, substitute_slider_values
from .programs import ProgramSet
from .sliders import denormalize_or_zero, make_ramp
from .tracker import Tracker
from .wav import write_wav_f32

DEFAULT_LIBRARY = Path(__file__).resolve().parent / "stdlib" / "v0"


class Repl:
    def __init__(self, sample_rate: int = 44100, tempo: int = 90,
                 beats_per_measure: int = 4, buffer_size: int = 1024,
                 library_root=None, precision: str = "fast",
                 jit: bool = True, out=sys.stdout, precompute: bool = True):
        self.out = out
        self.evaluator = Evaluator(sample_rate, tempo,
                                   library_root or DEFAULT_LIBRARY)
        self.tracker = Tracker(sample_rate, buffer_size,
                               precision=precision, jit=jit, levels=True)
        # Next-measure playback bakes on a worker thread (the reference's
        # precompute thread, main.rs:209-250): `play N measure` returns
        # immediately; `render` pumps finished bakes at block boundaries.
        self.player = Player(self.tracker, tempo, beats_per_measure,
                             precompute=precompute, async_precompute=True)
        self.programs: Optional[ProgramSet] = None
        self.keys_program: Optional[int] = None
        self._keys_fn = None
        self._note_offs: Dict[int, ir.Waveform] = {}
        self._histories: Dict[int, object] = {}
        self.rendered: List[np.ndarray] = []
        self.running = True

    # ------------------------------------------------------------------

    def log(self, message: str) -> None:
        print(message, file=self.out)

    def dispatch(self, line: str) -> None:
        parts = shlex.split(line.strip())
        if not parts:
            return
        cmd, args = parts[0], parts[1:]
        handler = getattr(self, f"cmd_{cmd}", None)
        if handler is None:
            self.log(f"unknown command: {cmd} (try 'help')")
            return
        try:
            handler(*args)
        except TuunError as e:
            self.log(f"error: {e}")
        except TypeError as e:
            self.log(f"usage error: {e}")

    def run(self) -> None:
        self.log("tuun-tpu live session — 'help' for commands")
        while self.running:
            try:
                line = input("tuun> ")
            except EOFError:
                break
            self.dispatch(line)

    # -- commands -------------------------------------------------------

    def cmd_help(self):
        self.log(
            "load FILE [all]      load a program file (all: every binding)\n"
            "list                 list programs\n"
            "play N [measure]     play program N (measure: at next measure)\n"
            "loop N M             play program N repeating every M measures\n"
            "stop [N]             stop program N (or everything)\n"
            "keys N               install program N as the keys instrument\n"
            "on KEY [VEL]         strike a key (MIDI note number)\n"
            "off KEY              release a key\n"
            "slider N LABEL V     set a slider (live voices ramp to V)\n"
            "edit N TEXT...       splice new text into program N\n"
            "save [FILE]          persist annotations + write source\n"
            "dump N               print program N's optimized waveform IR\n"
            "render SECS [FILE]   render the next SECS seconds (to WAV)\n"
            "status               voices / pending / marks\n"
            "quit")

    def cmd_load(self, path: str, mode: str = ""):
        source = Path(path).read_text()
        self.programs, message = ProgramSet.from_source(
            source, Path(path), all_bindings=mode == "all")
        if message:
            self.log(message)
        self.cmd_list()

    def _require_programs(self) -> ProgramSet:
        if self.programs is None:
            raise TuunError("no file loaded (use: load FILE)")
        return self.programs

    def cmd_list(self):
        ps = self._require_programs()
        for i, p in enumerate(ps.programs):
            if p.is_empty():
                continue
            sliders = " ".join(
                f"{c.label}={denormalize_or_zero(c.function, n):.3g}"
                for c, n in zip(p.sliders.configs,
                                p.sliders.normalized_values))
            extra = f"  [{sliders}]" if sliders else ""
            flat = " ".join(p.text.split())
            self.log(f"{ps.display_name(i)}: {flat[:60]}{extra}")

    def _slot(self, name: str) -> int:
        ps = self._require_programs()
        name = name.upper()
        if len(name) >= 2 and name[0].isalpha():
            index = (ord(name[0]) - ord("A")) * 8 + int(name[1:]) - 1
        else:
            index = int(name)
        if not (0 <= index < len(ps.programs)) or \
                ps.programs[index].is_empty():
            raise TuunError(f"no program {name}")
        return index

    def _evaluate(self, index: int):
        ps = self._require_programs()
        program = ps.programs[index]
        bindings = [SourceBinding(BOpen(("__prelude",)))]
        bindings += ps.evaluation_bindings(index)
        expr = parser.parse_program(program.text, Source.program())
        return eval_mod.evaluate(self.evaluator.resolve, bindings, expr)

    def cmd_play(self, name: str, measure: str = ""):
        ps = self._require_programs()
        index = self._slot(name)
        value = self._evaluate(index)
        if isinstance(value, ESeq):
            value = value.waveform
        if not isinstance(value, EWaveform):
            raise TuunError("program is not a waveform (try: keys)")
        program = ps.programs[index]
        self.player.play(WaveformId.program(index), value.waveform,
                         level_db=program.level_db,
                         sliders=program.sliders.configs,
                         normalized=program.sliders.normalized_values,
                         start_at_next_measure=measure == "measure")
        self.log(f"playing {ps.display_name(index)}")

    def cmd_loop(self, name: str, measures: str = "1"):
        ps = self._require_programs()
        index = self._slot(name)
        value = self._evaluate(index)
        if isinstance(value, ESeq):
            value = value.waveform
        if not isinstance(value, EWaveform):
            raise TuunError("program is not a waveform")
        program = ps.programs[index]
        self.player.play(WaveformId.program(index), value.waveform,
                         level_db=program.level_db,
                         sliders=program.sliders.configs,
                         normalized=program.sliders.normalized_values,
                         start_at_next_measure=True,
                         repeat_after_measures=int(measures))
        self.log(f"looping {ps.display_name(index)} every {measures} measures")

    def cmd_stop(self, name: str = ""):
        if not name:
            self.tracker.stop_all()
            self.log("stopped everything")
            return
        index = self._slot(name)
        self.player.stop(WaveformId.program(index))
        self.log(f"stopping {self._require_programs().display_name(index)}")

    def cmd_keys(self, name: str):
        index = self._slot(name)
        value = self._evaluate(index)
        if not isinstance(value, (EFunction, EBuiltIn)):
            raise TuunError("program is not a keys instrument")
        self.evaluator.apply_note_function(
            value, [parser.parse_program("60"), parser.parse_program("0.7")])
        self.keys_program = index
        self._keys_fn = value
        self.log(f"keys instrument installed from "
                 f"{self._require_programs().display_name(index)}")

    def cmd_on(self, key: str, velocity: str = "100"):
        if self._keys_fn is None:
            raise TuunError("no keys instrument (use: keys N)")
        ps = self._require_programs()
        program = ps.programs[self.keys_program]
        from .expr import EFloat
        note_on, note_off = self.evaluator.apply_note_function(
            self._keys_fn,
            [EFloat(float(key)), EFloat(float(velocity) / 127.0)])
        note_on = optimizer.optimize(note_on)
        self._note_offs[int(key)] = optimizer.optimize(note_off)
        note_on, _ = substitute_slider_values(
            note_on, program.sliders.configs,
            program.sliders.normalized_values)
        self.player.play_note(int(key), note_on,
                              level_db=program.level_db)
        self.log(f"note on {key}")

    def cmd_off(self, key: str):
        w = self._note_offs.pop(int(key), None)
        if w is None:
            return
        ps = self._require_programs()
        program = ps.programs[self.keys_program]
        w, _ = substitute_slider_values(
            w, program.sliders.configs, program.sliders.normalized_values)
        self.tracker.modify(WaveformId.key(int(key)), MarkId.TERMINATOR, w)
        self.tracker.remove_pending(WaveformId.key(int(key)))
        self.log(f"note off {key}")

    def cmd_slider(self, name: str, label: str, value: str):
        ps = self._require_programs()
        index = self._slot(name)
        program = ps.programs[index]
        for i, c in enumerate(program.sliders.configs):
            if c.label == label:
                target = float(value)
                last = denormalize_or_zero(
                    c.function, program.sliders.normalized_values[i])
                # Store normalized position (linear functions invert).
                from .expr import SliderLinear
                if isinstance(c.function, SliderLinear):
                    span = c.function.max - c.function.min
                    program.sliders.normalized_values[i] = \
                        (target - c.function.min) / span if span else 0.0
                ramp = make_ramp(
                    last, target,
                    self.tracker.block_size / self.tracker.sample_rate)
                self.tracker.modify(WaveformId.program(index),
                                    MarkId.slider(label), ramp)
                for kid in list(self._note_offs):
                    self.tracker.modify(WaveformId.key(kid),
                                        MarkId.slider(label), ramp)
                self.log(f"{label} -> {target}")
                return
        raise TuunError(f"no slider {label} on program {name}")

    def cmd_edit(self, name: str, *text: str):
        ps = self._require_programs()
        index = self._slot(name)
        from .programs import EditHistory
        history = self._histories.setdefault(
            index, EditHistory(ps.programs[index].text))
        err = ps.splice(index, " ".join(text))
        if err:
            self.log(f"splice failed (source unchanged): {err}")
        else:
            history.record(ps.programs[index].text)
            self.log(f"updated {ps.display_name(index)}")

    def cmd_undo(self, name: str):
        self._apply_history(name, "undo")

    def cmd_redo(self, name: str):
        self._apply_history(name, "redo")

    def _apply_history(self, name: str, op: str):
        ps = self._require_programs()
        index = self._slot(name)
        history = self._histories.get(index)
        text = getattr(history, op)() if history else None
        if text is None:
            self.log(f"nothing to {op}")
            return
        err = ps.splice(index, text)
        if err:
            self.log(f"{op} failed: {err}")
        else:
            self.log(f"{op}: {ps.display_name(index)} = {text[:50]}")

    def cmd_save(self, path: str = ""):
        ps = self._require_programs()
        for i, p in enumerate(ps.programs):
            if not p.is_empty() and p.sliders.configs:
                err = ps.persist_annotations(i)
                if err:
                    self.log(f"warning: {err}")
        ps.save(Path(path) if path else None)
        self.log(f"saved {path or ps.input_path}")

    def cmd_dump(self, name: str):
        index = self._slot(name)
        value = self._evaluate(index)
        if isinstance(value, ESeq):
            value = value.waveform
        if isinstance(value, EWaveform):
            self.log(ir.format_waveform(optimizer.optimize(value.waveform)))
        else:
            from .expr import format_expr
            self.log(format_expr(value))

    def cmd_render(self, seconds: str, path: str = ""):
        n_blocks = max(1, int(float(seconds) * self.tracker.sample_rate /
                              self.tracker.block_size))
        # Wait for outstanding next-measure bakes before rendering: time
        # is virtual here, so unlike the reference's real-time callback
        # (which would catch a late bake up after its fixed start) the
        # deterministic choice is free.  `play` itself stays instant.
        self.player.flush_bakes()
        chunks = []
        for _ in range(n_blocks):
            y, status = self.tracker.render_block()
            chunks.append(y)
        mix = np.concatenate(chunks)
        self.rendered.append(mix)
        if path:
            write_wav_f32(path, mix, self.tracker.sample_rate)
            self.log(f"rendered {len(mix)} samples to {path}")
        else:
            peak = float(np.abs(mix).max()) if len(mix) else 0.0
            self.log(f"rendered {len(mix)} samples (peak {peak:.3f}, "
                     f"load {status.tracker_load:.4f})")

    def cmd_status(self):
        self.log(f"now = {self.tracker.now} samples "
                 f"({self.tracker.now / self.tracker.sample_rate:.2f}s)")
        for v in self.tracker.active:
            self.log(f"active: {v.id}  rms {v.level_rms:.4f}  "
                     f"peak {v.level_peak:.4f}")
        self.log(f"pending: {[str(p.id) for p in self.tracker.pending]}")
        load = [x for x in self.tracker.load_metric.series() if x is not None]
        disp = [x for x in self.tracker.dispatch_metric.series()
                if x is not None]
        if load and disp:
            self.log(f"load avg {sum(load) / len(load):.4f}  "
                     f"dispatches/block avg {sum(disp) / len(disp):.1f}")

    def cmd_quit(self):
        self.player.close()
        self.running = False


def main(argv=None) -> int:
    args = argv if argv is not None else sys.argv[1:]
    repl = Repl()
    if args:
        repl.dispatch(f"load {args[0]}")
    repl.run()
    return 0


if __name__ == "__main__":
    sys.exit(main())
