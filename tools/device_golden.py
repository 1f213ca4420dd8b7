"""On-device golden ladder: every BASELINE.md correctness row executed on
the attached TPU, results committed as DEVICE_r{N}.md (+ .json).

Reference analog: unit_tests.sh run on real hardware per release
(reference: unit_tests.sh:5-235). CPU-mesh tests prove the logic; this
proves the production device path end to end: real Mosaic kernels, real
HBM, the axon tunnel, checkpoint files on disk, kill/resume.

Usage:  python tools/device_golden.py [quick|full] [round_tag]
  quick:  everything except the MM31 5*2^25 config (~minutes)
  full:   + MM31 P-1 ultralowmem golden (first compile of the 5*2^25
          shape is slow; budget ~1 h)
"""

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MODE = sys.argv[1] if len(sys.argv) > 1 else "quick"
TAG = sys.argv[2] if len(sys.argv) > 2 else "r04"

RESULTS = []


def step(name):
    def deco(fn):
        def run():
            t0 = time.time()
            try:
                detail = fn() or ""
                ok = True
            except Exception as e:  # noqa: BLE001 — ladder must continue
                detail = f"{type(e).__name__}: {e}"
                ok = False
            dt = time.time() - t0
            RESULTS.append({"step": name, "ok": ok, "secs": round(dt, 1),
                            "detail": str(detail)[:500]})
            print(f"[{'PASS' if ok else 'FAIL'}] {name} ({dt:.1f}s) "
                  f"{detail}", flush=True)
        return run
    return deco


def _opts(**kw):
    from prmers_tpu.io.options import Options
    kw.setdefault("verbose", False)
    kw.setdefault("save_dir", tempfile.mkdtemp(prefix="devgold_"))
    return Options(**kw)


@step("M127 LL prime (unit_tests.sh:5-9)")
def s_m127():
    from prmers_tpu.modes.prp_ll import run_prp_or_ll
    r = run_prp_or_ll(_opts(exponent=127, mode="ll", proof=False),
                      log=lambda *a: None)
    assert r.is_prime, "M127 must be prime"
    return "prime"


@step("M9941 PRP + proof hashes + verify (unit_tests.sh:188-204)")
def s_m9941_proof():
    from prmers_tpu.core.plan import cached_plan
    from prmers_tpu.core.proof import Proof, ProofSet
    from prmers_tpu.modes.prp_ll import run_prp_or_ll
    golden = [
        "proof [0] : M 87f3d3eabe4d6049, h 4526397be82cea45",
        "proof [1] : M d6a355de518574d7, h 7faf92dd48dc2013",
        "proof [2] : M 5aac235405ca84c7, h 934611f5f1192dd0",
    ]
    cwd = os.getcwd()
    d = tempfile.mkdtemp(prefix="devgold_")
    os.chdir(d)
    try:
        p = 9941
        ps = ProofSet(p, 3, widths=cached_plan(p).widths)
        r = run_prp_or_ll(_opts(exponent=p, mode="prp", save_dir=d),
                          proof_set=ps, log=lambda *a: None)
        assert r.is_prime, "M9941 must be PRP"
        lines = []
        proof = ps.compute_proof(log=lines.append)
        assert lines == golden, f"proof hashes diverge: {lines}"
        path = proof.save()
        assert Proof.load(path).verify(log=lambda *a: None)
        return "3 golden hashes + verify"
    finally:
        os.chdir(cwd)


@step("M11213 res64 stream @1000.. (unit_tests.sh:163-186)")
def s_m11213_stream():
    from prmers_tpu.modes.prp_ll import run_prp_or_ll
    golden = {
        1000: "FBA631FBCB73A011", 2000: "F01283650C4A1491",
        3000: "7E79193B757010B7", 4000: "31482E4D80FE99BB",
        5000: "973B76BACF73BBEF", 6000: "8CFFB332495FC320",
        7000: "98080C76DF068843", 8000: "8FDA516F885D3FEE",
        9000: "2AADBC4F1E318E92", 10000: "0A4AAF339C8B290C",
        11000: "A1F26F470CFE412D",
    }
    logs = []
    r = run_prp_or_ll(_opts(exponent=11213, mode="prp", proof=False,
                            res64_display_interval=1000),
                      log=lambda *a: logs.append(" ".join(map(str, a))))
    assert r.is_prime and r.res64 == "0000000000000001"
    seen = {}
    for line in logs:
        if "Res64:" in line and "Iter:" in line:
            it = int(line.split("Iter:")[1].split("|")[0].strip())
            seen[it] = line.split("Res64:")[1].strip()
    for it, want in golden.items():
        assert seen.get(it) == want, f"iter {it}: {seen.get(it)} != {want}"
    return "11 golden intermediates + final res64"


@step("M100003 PRP res64/res2048 (unit_tests.sh:137-149)")
def s_m100003():
    from prmers_tpu.modes.prp_ll import run_prp_or_ll
    r = run_prp_or_ll(_opts(exponent=100003, mode="prp", proof=False),
                      log=lambda *a: None)
    assert not r.is_prime
    assert r.res64 == "1CF45E9503C71FD6", r.res64
    assert r.res2048.lower().endswith("1cf45e9503c71fd6")
    return f"res64={r.res64}"


@step("GL error injection + recovery (unit_tests.sh:24-59)")
def s_erroriter():
    from prmers_tpu.modes.prp_ll import run_prp_or_ll
    logs = []
    r = run_prp_or_ll(_opts(exponent=9941, mode="prp", proof=False,
                            erroriter=55, checklevel=1),
                      log=lambda *a: logs.append(" ".join(map(str, a))))
    assert r.is_prime, "recovery must still find M9941 prime"
    joined = "\n".join(logs)
    assert "Injected error" in joined
    assert "Check FAILED" in joined or "Restore" in joined, joined[-500:]
    return "injected, detected, recovered, still prime"


@step("kill/resume mid-run (M11213, SIGKILL + checkpoint resume)")
def s_kill_resume():
    d = tempfile.mkdtemp(prefix="devgold_")
    prog = (
        "import sys; sys.path.insert(0, %r); "
        "from prmers_tpu.io.options import Options; "
        "from prmers_tpu.modes.prp_ll import run_prp_or_ll; "
        "r = run_prp_or_ll(Options(exponent=11213, mode='prp', "
        "proof=False, verbose=False, backup_interval=2.0, save_dir=%r)); "
        "print('RES64', r.res64)" % (REPO, d))
    pr = subprocess.Popen([sys.executable, "-c", prog],
                          stdout=subprocess.PIPE,
                          stderr=subprocess.STDOUT)
    # wait for the first checkpoint file, then kill mid-run
    deadline = time.time() + 600
    ck = os.path.join(d, "m_11213.ckpt")
    while time.time() < deadline and not os.path.exists(ck):
        if pr.poll() is not None:
            break
        time.sleep(0.5)
    if pr.poll() is None:
        time.sleep(1.0)
        pr.kill()
        pr.wait()
        killed = True
    else:
        killed = False   # finished before the first backup — still resume-tests
    out = subprocess.run([sys.executable, "-c", prog], capture_output=True,
                         text=True, timeout=1200)
    assert "RES64 0000000000000001" in out.stdout, out.stdout[-500:]
    return f"killed_midrun={killed}, resumed to golden res64"


@step("M367 P-1 S1+S2 factors (unit_tests.sh:60)")
def s_m367():
    from prmers_tpu.modes.pm1 import run_pm1
    r = run_pm1(_opts(exponent=367, mode="pm1", b1=11981, b2=38971),
                log=lambda *a: None)
    assert r.factor is not None and r.factor % 646300400639 == 0, r.factor
    return f"factor={r.factor}"


@step("M541 P-1 B1=899 factor (unit_tests.sh:205-213)")
def s_m541():
    from prmers_tpu.modes.pm1 import run_pm1
    r = run_pm1(_opts(exponent=541, mode="pm1", b1=899), log=lambda *a: None)
    assert r.factor is not None and r.factor % 4312790327 == 0, r.factor
    return f"factor={r.factor}"


@step("M701 ECM Edwards B1=6000 B2=33333 K=8 (README.md:103-105)")
def s_m701():
    from prmers_tpu.modes.ecm_edwards import run_ecm_edwards
    r = run_ecm_edwards(_opts(exponent=701, mode="ecm", b1=6000, b2=33333,
                              curves=8, curve_seed=1),
                        log=lambda *a: None)
    assert r.factor and ((1 << 701) - 1) % r.factor == 0, r.factor
    return f"factor={r.factor}"


@step("MM31 P-1 B1=100 B2=5000 ultralowmem -> 295257526626031 "
      "(README.md:97,636; n=5*2^25)")
def s_mm31():
    from prmers_tpu.engine import factory
    from prmers_tpu.modes.pm1 import run_pm1
    eligible = factory._pallas_eligible((1 << 31) - 1)
    r = run_pm1(_opts(exponent=(1 << 31) - 1, mode="pm1", b1=100, b2=5000,
                      pm1_variant="ultralowmem", no_gcd_stage1=True),
                log=lambda *a: None)
    assert r.factor is not None and r.factor % 295257526626031 == 0, r.factor
    return f"factor={r.factor}, pallas_eligible={eligible}"


def main():
    import jax
    print(f"devices: {jax.devices()}", flush=True)
    steps = [s_m127, s_m9941_proof, s_m11213_stream, s_m100003,
             s_erroriter, s_kill_resume, s_m367, s_m541, s_m701]
    if MODE == "full":
        steps.append(s_mm31)
    for fn in steps:
        fn()
    npass = sum(1 for r in RESULTS if r["ok"])
    out = {
        "tag": TAG, "mode": MODE,
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
        "device": str(jax.devices()[0]),
        "passed": npass, "total": len(RESULTS), "steps": RESULTS,
    }
    jpath = os.path.join(REPO, f"DEVICE_{TAG}.json")
    with open(jpath, "w") as f:
        json.dump(out, f, indent=1)
    lines = [f"# DEVICE_{TAG} — on-device golden ladder",
             "",
             f"Device: {out['device']}  |  {out['timestamp']}  |  "
             f"{npass}/{len(RESULTS)} passed "
             f"(reference analog: unit_tests.sh on real hardware)",
             "", "| Step | Result | Time | Detail |", "|---|---|---:|---|"]
    for r in RESULTS:
        lines.append(f"| {r['step']} | {'PASS' if r['ok'] else 'FAIL'} | "
                     f"{r['secs']}s | {r['detail']} |")
    with open(os.path.join(REPO, f"DEVICE_{TAG}.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"\n{npass}/{len(RESULTS)} passed -> DEVICE_{TAG}.md", flush=True)
    sys.exit(0 if npass == len(RESULTS) else 1)


if __name__ == "__main__":
    main()
