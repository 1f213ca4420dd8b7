"""Command-line interface — flag names follow the reference CLI
(reference: include/io/CliParser.hpp:11-145, ~120 options; the subset here
covers every implemented subsystem and grows with them). `-config <file>`
expands file tokens inline before parsing (reference: src/main.cpp:93-110).
"""

from __future__ import annotations

import argparse
import shlex
import sys

from .options import Options


def _expand_config(argv: list[str]) -> list[str]:
    out = []
    i = 0
    while i < len(argv):
        if argv[i] in ("-config", "--config") and i + 1 < len(argv):
            with open(argv[i + 1]) as f:
                out.extend(shlex.split(f.read(), comments=True))
            i += 2
        else:
            out.append(argv[i])
            i += 1
    return out


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="prmers",
        description="TPU-native Mersenne arithmetic: PRP / LL / P-1 / ECM "
                    "with Gerbicz-Li error checking and GIMPS proofs")
    ap.add_argument("exponent", nargs="?", type=int, default=0)
    mode = ap.add_mutually_exclusive_group()
    mode.add_argument("-prp", action="store_true", help="PRP test (default)")
    mode.add_argument("-ll", action="store_true", help="Lucas-Lehmer (unsafe)")
    mode.add_argument("-llsafe", action="store_true",
                      help="LL with sqrt(3)-pair error checking")
    mode.add_argument("-llsafe2", action="store_true",
                      help="LL with block-replay error checking")
    ap.add_argument("-llsafeb", type=int, default=0,
                    help="llsafe2 replay block size (default sqrt(p))")
    mode.add_argument("-pm1", action="store_true", help="P-1 factoring")
    mode.add_argument("-ecm", action="store_true", help="ECM factoring")
    ap.add_argument("-s2variant", dest="stage2_variant", default="vtrace",
                    choices=["vtrace", "classic", "nk"],
                    help="P-1 stage 2 algorithm (nk = the n^K pairwise-"
                         "difference variant, with -nmax and -K)")
    ap.add_argument("-nmax", type=int, default=0,
                    help="n^K stage 2: build H^(m^K) for m = 1..nmax")
    ap.add_argument("-lowmem", action="store_true",
                    help="P-1 with 3 registers: no GL buffers, stage 2 as "
                         "a streamed H^Q product-exponent (no baby table)")
    ap.add_argument("-ultralowmem", action="store_true",
                    help="P-1 with 1-2 registers (H^Q two-register stage "
                         "2; base-3 recompute variant with one)")
    ap.add_argument("-s2regs", dest="stage2_regs_cap", type=int, default=0,
                    help="V-trace register budget (memory cap)")
    ap.add_argument("-resume_save", default="",
                    help="write a GMP-ECM P-1 resume file after stage 1")
    ap.add_argument("-p95_save", default="",
                    help="write a Prime95 stage-1 save after stage 1")
    ap.add_argument("-resume_load", default="",
                    help="import a stage-1 X from a GMP-ECM or Prime95 file")
    ap.add_argument("-ecm_check_interval", type=int, default=0,
                    help="Edwards invariant-check cadence in group ops")
    mode.add_argument("-bench", action="store_true", help="benchmark mode")
    mode.add_argument("-memtest", action="store_true",
                      help="device determinism / memory test")
    mode.add_argument("-tune", action="store_true",
                      help="measure iter/s per transform size and persist")
    ap.add_argument("-wagstaff", action="store_true",
                    help="Wagstaff PRP (exponent = 2q)")

    ap.add_argument("-backend", default="auto",
                    choices=["auto", "pallas", "jax", "numpy", "sharded"])
    ap.add_argument("-arith", default="auto",
                    choices=["auto", "gl64", "fft3161"],
                    help="arithmetic path: Goldilocks (gl64) or the "
                         "paired GF(M31^2)xGF(M61^2) NTT (fft3161)")
    ap.add_argument("-fft", dest="fft_spec", default="",
                    help="forced transform size (e.g. 8M)")

    ap.add_argument("-b1", type=int, default=0)
    ap.add_argument("-b2", type=int, default=0)
    ap.add_argument("-maxe", dest="max_e_bits", type=int, default=0)
    ap.add_argument("-d", dest="stage2_d", type=int, default=0,
                    help="stage-2 giant step D")
    ap.add_argument("-curves", "-K", dest="curves", type=int, default=1)
    ap.add_argument("-sigma", default="")
    ap.add_argument("-curve-seed", dest="curve_seed", type=int, default=0)
    ap.add_argument("-torsion", type=int, default=8,
                    help="ECM curve family: 0 = Suyama/generic, 8 = "
                         "Montgomery torsion-8 (default), 16 = "
                         "torsion-16, 163 = Edwards IV-163 family")
    ap.add_argument("-montgomery", action="store_true",
                    help="ECM Montgomery/Suyama curves instead of the "
                         "default twisted Edwards")

    ap.add_argument("-factors", default="",
                    help="comma-separated known factors (cofactor PRP)")

    ap.add_argument("-nogerbiczli", action="store_true")
    ap.add_argument("-checklevel", type=int, default=0)
    ap.add_argument("-erroriter", type=int, default=0)

    ap.add_argument("-t", dest="backup_interval", type=float, default=300.0)
    ap.add_argument("-save-dir", dest="save_dir", default=".")

    ap.add_argument("-noproof", action="store_true")
    ap.add_argument("-proofpower", dest="proof_power", type=int, default=0)
    ap.add_argument("-proofverify", action="store_true")

    ap.add_argument("-worktodo", dest="worktodo_path", default="worktodo.txt")
    ap.add_argument("-results", dest="results_path", default="results.txt")
    ap.add_argument("-user", default="")
    ap.add_argument("-computer", default="")
    ap.add_argument("-aid", default="")

    ap.add_argument("-gui", action="store_true", help="start the web GUI")
    ap.add_argument("-gui-port", dest="gui_port", type=int, default=3131)
    ap.add_argument("-res64_display_interval", type=int, default=0)
    ap.add_argument("-profile", action="store_true")
    ap.add_argument("-q", "-quiet", dest="quiet", action="store_true")
    ap.add_argument("-iters", dest="bench_iters", type=int, default=0)
    ap.add_argument("-noask", action="store_true",
                    help="accepted for reference compatibility (no-op)")
    return ap


def parse_args(argv: list[str] | None = None) -> Options:
    argv = _expand_config(list(sys.argv[1:] if argv is None else argv))
    ns = build_parser().parse_args(argv)
    mode = ("ll" if ns.ll else "llsafe2" if ns.llsafe2 else
            "llsafe" if ns.llsafe else
            "pm1" if ns.pm1 else "ecm" if ns.ecm else
            "bench" if ns.bench else "memtest" if ns.memtest else
            "tune" if ns.tune else "prp")
    factors = tuple(f.strip() for f in ns.factors.split(",") if f.strip())
    return Options(
        exponent=ns.exponent, mode=mode, wagstaff=ns.wagstaff,
        backend=ns.backend, fft_spec=ns.fft_spec, arith=ns.arith,
        gerbiczli=not ns.nogerbiczli, checklevel=ns.checklevel,
        erroriter=ns.erroriter, backup_interval=ns.backup_interval,
        save_dir=ns.save_dir, proof=not ns.noproof,
        proof_power=ns.proof_power, proof_verify=ns.proofverify,
        b1=ns.b1, b2=ns.b2, max_e_bits=ns.max_e_bits,
        pm1_variant=("ultralowmem" if ns.ultralowmem else
                     "lowmem" if ns.lowmem else "auto"),
        stage2_d=ns.stage2_d, curves=ns.curves, curve_seed=ns.curve_seed,
        sigma=ns.sigma, torsion=ns.torsion, edwards=not ns.montgomery,
        known_factors=factors, worktodo_path=ns.worktodo_path,
        results_path=ns.results_path, aid=ns.aid, user=ns.user,
        computer=ns.computer, ecm_check_interval=ns.ecm_check_interval,
        llsafe_block=ns.llsafeb, stage2_variant=ns.stage2_variant,
        stage2_regs_cap=ns.stage2_regs_cap,
        nmax=ns.nmax, k_nk=ns.curves,
        resume_save=ns.resume_save, p95_save=ns.p95_save,
        resume_load=ns.resume_load,
        res64_display_interval=ns.res64_display_interval,
        profile=ns.profile, verbose=not ns.quiet, gui=ns.gui,
        gui_port=ns.gui_port, bench_iters=ns.bench_iters,
    )
