"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: BLS12-377 G1 MSM throughput (points/s), the prize1a metric.
Baseline: the best GPU entry's amortized 2^26 MSM on an NVIDIA A40 —
2.2-2.3 s for 4 x 2^26 (combined yrrid+matter-labs solution,
`combined-top-solutions/README.md:26-28`) ≈ 1.22e8 points/s.

Env knobs (reference conventions, `yrrid/tests/msm.rs:13-22`):
  BENCH_NPOW  (default 16)  log2 of the MSM size
  MSM_SEED    (default 42)
  BENCH_WINDOW (default auto)
  BENCH_PROFILE=<dir>  capture a jax.profiler trace of the steady-state
  iterations (the role of the reference's nvprof/CUDA-event instrumentation,
  `MSM.cu:496-500`; per-phase wall timers live in scripts/profile_msm_te.py)
Points are generated once via the reference's clone-extension trick
(`yrrid/src/util.rs:15-29`): a small seeded base set, tiled to size.
"""

import json
import os
import random
import sys
import time

import numpy as np

BASELINE_POINTS_PER_S = 1.22e8  # A40, combined-top-solutions, amortized


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_ntt():
    """Secondary metric: Goldilocks four-step NTT latency (prize2-ntt).
    Baseline: supranational FPGA 2.47 ms at 2^24
    (`prize2-ntt/supranational/README.md:462-467`)."""
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import random

    from zprize_tpu.field import fp
    from zprize_tpu.field.spec import GOLDILOCKS
    from zprize_tpu.ntt.fourstep import intt_fourstep, ntt_fourstep

    from zprize_tpu.ntt import gl_kernel, gl_ops

    logn = int(os.environ.get("BENCH_NTT_LOGN", "24"))
    l1, l2 = logn // 2, logn - logn // 2
    n = 1 << logn
    rng = random.Random(0)
    # seeded sample prefix + tiled tail (host int conversion at 2^24 is slow)
    sample = [rng.randrange(GOLDILOCKS.p) for _ in range(4096)]
    a = jnp.tile(fp.from_ints(GOLDILOCKS, sample), (n // 4096, 1))
    alo, ahi = gl_ops.from_limbs(GOLDILOCKS, a)
    log(f"ntt: 2^{logn} goldilocks, packed four-step {l1}+{l2} (pallas)")

    t0 = time.time()
    olo, ohi = gl_kernel.ntt_fourstep_packed(l1, l2, alo, ahi)
    jax.device_get(olo[0])
    log(f"first run (incl. compile): {time.time()-t0:.1f}s")

    # correctness: full comparison against the generic-engine four-step
    ref = ntt_fourstep(GOLDILOCKS, a, l1, l2)
    rlo, rhi = gl_ops.from_limbs(GOLDILOCKS, ref)
    clo, chi = gl_ops.gl_canon(olo, ohi)
    ok = bool(jax.device_get(jnp.all((clo == rlo) & (chi == rhi))))
    if not ok:
        log("NTT MISMATCH vs generic engine — benchmark invalid")
        print(json.dumps({"metric": f"goldilocks_ntt_2^{logn}_ms",
                          "value": 0.0, "unit": "ms", "vs_baseline": 0.0,
                          "error": "mismatch"}))
        return
    log(f"all 2^{logn} outputs verified vs the generic engine")

    # Steady-state: K chained DEPENDENT transforms inside ONE dispatch,
    # divided by K.  The axon tunnel has a ~24 ms dispatch+sync floor
    # (measured: a no-op jit round trip costs the same as a full 128 MB
    # transpose), so single-dispatch wall latency cannot resolve device
    # time at all; the chain amortizes the floor without allowing any
    # cross-transform overlap (each output feeds the next input).
    chain_k = int(os.environ.get("BENCH_NTT_CHAIN", "8"))

    @jax.jit
    def chain(lo, hi):
        def body(carry, _):
            nlo, nhi = gl_kernel.ntt_fourstep_packed(l1, l2, *carry)
            return (nlo, nhi), ()
        (lo, hi), _ = jax.lax.scan(body, (lo, hi), None, length=chain_k)
        return lo, hi

    clo, chi2 = chain(alo, ahi)
    jax.device_get(clo[0])          # warm the chained shape
    iters = int(os.environ.get("BENCH_ITERS", "5"))
    times = []
    for _ in range(iters):
        t0 = time.time()
        clo, chi2 = chain(alo, ahi)
        jax.device_get(clo[0])
        times.append((time.time() - t0) / chain_k)
    dt = sum(times) / iters * 1e3
    log(f"steady-state: {dt:.1f} ms per NTT "
        f"({chain_k}-chain x {iters} iters, "
        f"min {min(times)*1e3:.1f} / max {max(times)*1e3:.1f} ms)")
    # baseline: 2.47 ms (supranational FPGA, 2^24)
    print(json.dumps({"metric": f"goldilocks_ntt_2^{logn}_ms",
                      "value": dt, "unit": "ms",
                      "vs_baseline": 2.47 / dt}))


def bench_ntt_dist():
    """Distributed-NTT metric: the all_to_all four-step over an 8-device
    mesh (`parallel/ntt_sharded.py`), dryrun-scale on VIRTUAL CPU devices
    (one physical TPU chip in this environment — the mesh path is the
    same SPMD program that would ride ICI on a pod slice).  Baseline
    context: hardcaml's 8->64-core scaling table
    (`zprize_ntt_top.mld:142-149`, 231.5 ms at 8 cores).

    Runs the measurement in a CHILD process: 8 virtual devices on a
    loaded 4-core box can hard-abort on XLA:CPU's 40 s collective
    rendezvous timeout ("Termination timeout for all gather"), which
    kills the process outright — the parent turns that into a JSON error
    line instead of a silent death."""
    if os.environ.get("ZPRIZE_NTT_DIST_CHILD") != "1":
        import subprocess
        env = dict(os.environ,
                   ZPRIZE_NTT_DIST_CHILD="1", BENCH_METRIC="ntt_dist")
        logn = int(os.environ.get("BENCH_NTT_LOGN", "24"))
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env, stdout=subprocess.PIPE,
                           timeout=float(os.environ.get(
                               "BENCH_NTT_DIST_TIMEOUT_S", "3600")))
        out = r.stdout.decode()
        if '"metric"' in out:
            sys.stdout.write(out)
            return
        log(f"ntt_dist child died (rc={r.returncode}) before reporting — "
            "likely the XLA:CPU collective rendezvous abort under load; "
            "rerun when the box is idle")
        print(json.dumps({"metric": f"goldilocks_ntt_dist_2^{logn}_ms",
                          "value": 0.0, "unit": "ms", "vs_baseline": 0.0,
                          "error": f"child exited rc={r.returncode} "
                                   "without a result (collective abort?)"}))
        return
    n_dev = int(os.environ.get("BENCH_NTT_DEVS", "8"))
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count={n_dev}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import random

    import jax.numpy as jnp
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from zprize_tpu.field import fp
    from zprize_tpu.field.spec import GOLDILOCKS
    from zprize_tpu.ntt.fourstep import ntt_fourstep
    from zprize_tpu.parallel.mesh import make_mesh
    from zprize_tpu.parallel.ntt_sharded import (flatten_output,
                                                 ntt_fourstep_sharded)

    logn = int(os.environ.get("BENCH_NTT_LOGN", "24"))
    l1, l2 = logn // 2, logn - logn // 2
    n1, n2 = 1 << l1, 1 << l2
    rng = random.Random(0)
    sample = [rng.randrange(GOLDILOCKS.p) for _ in range(4096)]
    a = jnp.tile(fp.from_ints(GOLDILOCKS, sample), ((n1 * n2) // 4096, 1))
    mesh = make_mesh(n_dev)
    m = a.reshape(n1, n2, -1)
    log(f"ntt_dist: 2^{logn} goldilocks over {n_dev}-dev CPU mesh "
        f"({l1}+{l2} four-step, all_to_all transpose)")

    t0 = time.time()
    out = ntt_fourstep_sharded(GOLDILOCKS, m, mesh, l1, l2)
    jax.block_until_ready(out)
    log(f"first run (incl. compile): {time.time()-t0:.1f}s")

    # verification entirely via HOST transfers: comparing a mesh-sharded
    # array against a replicated reference inserts XLA:CPU collectives,
    # and under load those hard-abort the process on a 40 s rendezvous
    # timeout (8 virtual devices > physical cores)
    import numpy as _np
    got_np = _np.asarray(jax.device_get(out))            # (n1, n2, L)
    got_np = _np.swapaxes(got_np, 0, 1).reshape(-1, got_np.shape[-1])
    ref = ntt_fourstep(GOLDILOCKS, a, l1, l2)
    ref_np = _np.asarray(jax.device_get(fp.to_canonical(GOLDILOCKS, ref)))
    can_np = _np.asarray(jax.device_get(
        fp.to_canonical(GOLDILOCKS, jnp.asarray(got_np))))
    ok = bool((can_np == ref_np).all())
    if not ok:
        log("DISTRIBUTED NTT MISMATCH — benchmark invalid")
        print(json.dumps({"metric": f"goldilocks_ntt_dist_2^{logn}_ms",
                          "value": 0.0, "unit": "ms", "vs_baseline": 0.0,
                          "error": "mismatch"}))
        return
    log("all outputs verified vs the single-device four-step")

    iters = int(os.environ.get("BENCH_ITERS", "3"))
    times = []
    for _ in range(iters):
        t0 = time.time()
        out = ntt_fourstep_sharded(GOLDILOCKS, m, mesh, l1, l2)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    dt = min(times) * 1e3
    log(f"steady-state: {dt:.1f} ms per distributed NTT "
        f"(min of {iters}; virtual CPU mesh — collective-path timing, "
        f"not TPU kernel timing)")
    print(json.dumps({"metric": f"goldilocks_ntt_dist_2^{logn}_ms",
                      "value": dt, "unit": "ms",
                      "vs_baseline": 231.5 / dt}))


def bench_plonk():
    """Tertiary metric: PLONK prover ns/constraint on the reference's
    Merkle-membership workload (`winderica/distributed/src/circuit.rs:676-703`
    shape, scaled to one chip).  Baseline: winderica's single-node
    TurboPlonk at 29,591 ns/constraint (`winderica/bench.md:13-17`)."""
    import random as _rnd

    import jax
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from zprize_tpu.curve.spec import BLS12_377_G1
    from zprize_tpu.field import fp
    from zprize_tpu.field.spec import BLS12_377_FR
    from zprize_tpu.hash import merkle
    from zprize_tpu.hash.grain import snarkvm_config
    from zprize_tpu.pcs import kzg
    from zprize_tpu.plonk import prover as plonk_prover
    from zprize_tpu.plonk import verifier as plonk_verifier
    from zprize_tpu.plonk.gadgets import generate_membership_circuit

    curve, fr = BLS12_377_G1, BLS12_377_FR
    cfg = snarkvm_config(fr, 2)
    n_proofs = int(os.environ.get("BENCH_PLONK_PROOFS", "16"))
    height = int(os.environ.get("BENCH_PLONK_HEIGHT", "8"))
    rng = _rnd.Random(17)

    t0 = time.time()
    cb, handles, indices = generate_membership_circuit(cfg, n_proofs, height)
    leaves_int = [rng.randrange(fr.p) for _ in range(1 << height)]
    levels = merkle.build_tree(cfg, fp.from_ints(fr, leaves_int))
    root = int(fp.to_ints(fr, merkle.root(levels))[()])
    assignment = {}
    for (leaf_var, sib_vars), idx in zip(handles, indices):
        path = merkle.prove(levels, idx)
        assignment[leaf_var] = leaves_int[idx]
        for sv, (sib, _) in zip(sib_vars, path):
            assignment[sv] = int(fp.to_ints(fr, sib)[()])
    assignment = cb.compute_witness(assignment)
    cc = cb.compile()
    public = [root] * n_proofs
    log(f"plonk: membership workload, {n_proofs} proofs x height {height} "
        f"-> n = {cc.n} constraints (built in {time.time()-t0:.1f}s)")

    t0 = time.time()
    srs = kzg.setup_test_srs(curve, cc.n + 8, seed=3)
    pk, vk = plonk_prover.setup(curve, cc, srs)
    w_ints = cc.wire_values(assignment)
    wires = fp.from_ints(fr, w_ints.tolist())
    log(f"keygen + witness planes (untimed init): {time.time()-t0:.1f}s")

    def run():
        proof = plonk_prover.prove_planes(pk, wires, public,
                                          blinding_rng=rng)
        jax.device_get(proof.w_zeta_omega.z.ravel()[0])
        return proof

    t0 = time.time()
    proof = run()
    log(f"first proof (incl. compile): {time.time()-t0:.1f}s")
    ok = plonk_verifier.verify(vk, srs, proof, public)
    if not ok:
        log("PROOF DID NOT VERIFY — benchmark invalid")
        print(json.dumps({"metric": f"plonk_ns_per_constraint_n{cc.n}",
                          "value": 0.0, "unit": "ns/constraint",
                          "vs_baseline": 0.0, "error": "verify failed"}))
        return
    log("proof verified")

    iters = int(os.environ.get("BENCH_ITERS", "3"))
    t0 = time.time()
    for _ in range(iters):
        run()
    dt = (time.time() - t0) / iters
    ns_per = dt / cc.n * 1e9
    log(f"steady-state: {dt:.2f} s per proof -> {ns_per:.0f} ns/constraint")
    print(json.dumps({"metric": f"plonk_ns_per_constraint_n{cc.n}",
                      "value": ns_per, "unit": "ns/constraint",
                      "vs_baseline": 29591.0 / ns_per}))


def bench_posw():
    """team-prize2 metric: PoSW (Marlin) proofs per 20 s window.
    Baseline: simonatsn 745-755 proofs/20 s on one RTX 4000
    (`team-division/prize2-posw-gpu/simonatsn/README.md:59-61`)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from zprize_tpu.field.spec import BLS12_377_FR
    from zprize_tpu.posw import posw

    t0 = time.time()
    keys = posw.setup()
    log(f"posw keygen (untimed init): {time.time()-t0:.1f}s; "
        f"n={1 << keys.pk.log_n} k={1 << keys.pk.log_k}")
    window = float(os.environ.get("BENCH_POSW_WINDOW_S", "20"))
    batch = int(os.environ.get("BENCH_POSW_BATCH", "8"))
    # warm + oracle on the BATCHED shape only (the dispatcher-verifies-
    # everything pattern): the scoring loop never runs the unbatched
    # prover, and its B=1 compile alone was a second ~27 min cold remote
    # build in r4 — one batched warm covers both roles
    t0 = time.time()
    sol = posw.mine_batch(keys, header=42, target=BLS12_377_FR.p,
                          start_nonce=1, max_nonces=batch, batch=batch)
    assert sol is not None
    if not posw.verify_work(keys, keys.pk.srs, sol, BLS12_377_FR.p):
        log("POSW PROOF DID NOT VERIFY — benchmark invalid")
        print(json.dumps({"metric": "posw_proofs_per_20s", "value": 0.0,
                          "unit": "proofs/20s", "vs_baseline": 0.0,
                          "error": "verify failed"}))
        return
    log(f"first batched prove (B={batch}, incl. compile): "
        f"{time.time()-t0:.1f}s; solution verified")
    t0 = time.time()
    nonce, proofs = 1 + batch, 0
    while time.time() - t0 < window:
        # target=p accepts every proof, so each call proves exactly `batch`
        # nonces (one prove_batch dispatch set) and returns
        sol = posw.mine_batch(keys, header=42, target=BLS12_377_FR.p,
                              start_nonce=nonce, max_nonces=batch,
                              batch=batch)
        assert sol is not None
        nonce += batch
        proofs += batch
    dt = time.time() - t0
    rate = proofs / dt * 20.0
    log(f"steady-state: {proofs} proofs in {dt:.1f}s -> {rate:.1f} /20s")
    print(json.dumps({"metric": "posw_proofs_per_20s", "value": rate,
                      "unit": "proofs/20s", "vs_baseline": rate / 750.0}))


def bench_verify():
    """team-prize1 metric: Marlin batch-verification rounds per 10 s.
    Mirrors the challenge harness (`prize-marlin-verifier/src/main.rs:233-257`):
    three pre-built proof groups of 10 / 100 / 20 proofs with faulty
    proofs injected at 1/5, 1/50, 1/10 probability (tamper = negate the
    g_1 commitment, `main.rs:182`); one verified group = one round; every
    per-proof verdict must be exact.  Baseline: sean-sn at 14 rounds/10 s
    on ONE vCPU (`sean-sn/README.md:58`).

    Runs on CPU: the track is scored on a 1-vCPU instance and the
    workload is host-int pairings + sumcheck checks with a Poseidon
    transcript — there is no MSM/NTT to feed the TPU.  Caveat vs the
    baseline: the reference's proofs are snarkVM BATCH proofs over 10-100
    instances each, ours are single-instance Marlin proofs, so a
    reference round does more instance-work per proof; the rounds/10 s
    comparison is an approximation (noted in PARITY).  Proof objects are
    reused across group slots (4 distinct good + 4 tampered): verification
    cost does not depend on proof provenance — the same clone-extension
    trick the MSM harness uses (`yrrid/src/util.rs:15-29`)."""
    import hashlib
    with open("/proc/cpuinfo") as fh:
        info = [ln for ln in fh.read().splitlines()
                if ln.startswith(("model name", "flags"))][:2]
    tag = hashlib.sha1("\n".join(info).encode()).hexdigest()[:10]
    os.environ["JAX_COMPILATION_CACHE_DIR"] = f"/tmp/zprize_tpu_jax_cache_{tag}"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import random as _rnd
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from zprize_tpu.curve.spec import BLS12_377_G1
    from zprize_tpu.field.spec import BLS12_377_FR
    from zprize_tpu.marlin import ahp, indexer
    from zprize_tpu.marlin.r1cs import R1CSBuilder
    from zprize_tpu.pcs import kzg

    curve, fr = BLS12_377_G1, BLS12_377_FR
    p = fr.p

    # ~100-constraint circuit, the harness's Benchmark shape
    # (`main.rs:73-116`: c = a*b public, filler constraints)
    n_constraints = int(os.environ.get("BENCH_VERIFY_CONSTRAINTS", "100"))
    rb = R1CSBuilder(fr, num_public=1)
    a_v = rb.new_witness()
    b_v = rb.new_witness()
    c_v = rb.mul(a_v, b_v)
    for _ in range(n_constraints - 2):
        rb.mul(a_v, b_v)
    rb.enforce_equal(c_v, rb.public(0))
    r1 = rb.build()

    def witness(a_i, b_i):
        c_i = a_i * b_i % p
        z = [1, c_i, a_i % p, b_i % p] + [c_i] * (n_constraints - 1)
        return z

    rng = _rnd.Random(0xC0FFEE)
    t0 = time.time()
    n = 1 << max(r1.num_constraints, r1.num_vars, 2).bit_length()
    k = 1 << max(len(r1.a), len(r1.b), len(r1.c), 2).bit_length()
    srs = kzg.setup_test_srs(curve, max(3 * k, 2 * n) + 8, seed=11)
    pk = indexer.index(curve, r1, srs)
    log(f"setup (srs n={max(3 * k, 2 * n) + 8} + index): {time.time()-t0:.1f}s; "
        f"{r1.num_constraints} constraints")

    t0 = time.time()
    zs = [witness(rng.randrange(1, p), rng.randrange(1, p)) for _ in range(4)]
    for z in zs:
        assert r1.is_satisfied(z)
    proofs = ahp.prove_batch(pk, zs)
    pool = [(z[:r1.num_public], pr) for z, pr in zip(zs, proofs)]
    log(f"proved {len(pool)} distinct instances: {time.time()-t0:.1f}s")
    for pub, pr in pool:
        assert ahp.verify(pk.vk, srs, pub, pr)

    def tampered(proof):
        import copy
        bad = copy.deepcopy(proof)
        x, y = bad.comms["g_1"]
        bad.comms["g_1"] = (x, (-y) % curve.field.p)    # main.rs:182 tamper
        return bad

    bad_pool = [(pub, tampered(pr)) for pub, pr in pool]

    # groups exactly as the harness builds them (`main.rs:174-231`)
    def build_group(count, fault_denom):
        group, faulty = [], []
        for _ in range(count):
            is_bad = rng.randrange(fault_denom) == 0
            src = bad_pool if is_bad else pool
            group.append(src[rng.randrange(len(src))])
            faulty.append(is_bad)
        return group, faulty

    groups = [build_group(10, 5), build_group(100, 50), build_group(20, 10)]
    for gi, (g, f) in enumerate(groups):
        log(f"group {gi + 1}: {len(g)} proofs, {sum(f)} faulty")

    # warm one pass (transcript sponge compiles) + verdict check
    vrng = _rnd.Random(7)
    t0 = time.time()
    for g, f in groups:
        verdicts = ahp.verify_group(pk.vk, srs, g, rng=vrng)
        assert verdicts == [not x for x in f], "verdict mismatch"
    log(f"warm cycle (3 groups, incl. compile): {time.time()-t0:.1f}s; "
        f"all verdicts exact")

    window = float(os.environ.get("BENCH_VERIFY_WINDOW_S", "10"))
    rounds = 0
    t0 = time.time()
    while True:
        g, f = groups[rounds % 3]
        verdicts = ahp.verify_group(pk.vk, srs, g, rng=vrng)
        if verdicts != [not x for x in f]:
            log("VERDICT MISMATCH — benchmark invalid")
            print(json.dumps({"metric": "marlin_verify_rounds_per_10s",
                              "value": 0.0, "unit": "rounds/10s",
                              "vs_baseline": 0.0, "error": "verdict mismatch"}))
            return
        rounds += 1
        if time.time() - t0 > window:
            break
    dt = time.time() - t0
    rate = rounds / dt * 10.0
    log(f"steady-state: {rounds} rounds in {dt:.1f}s -> {rate:.1f} rounds/10s")
    print(json.dumps({"metric": "marlin_verify_rounds_per_10s",
                      "value": rate, "unit": "rounds/10s",
                      "vs_baseline": rate / 14.0}))


def _scalar_batch_np(curve, rng_np, n):
    """Vectorized canonical scalar batch: (n, L) uint16 base-2^15 limb
    planes, uniform in [0, order) by limb-wise rejection sampling — no
    python-int loops (the r4 staging built each batch from 2^24 randrange
    calls + a python limb split: 9.8 s/batch, VERDICT r4 #6; this is
    ~100x).  The planes are exactly `fp.compact_scalars` output form
    (canonical, limbs < 2^15), accepted directly by the digit
    extraction."""
    fr = curve.scalar
    L = fr.n_limbs
    order = curve.order
    r_limbs = [(order >> (15 * k)) & 0x7FFF for k in range(L)]
    top_bits = order.bit_length() - 15 * (L - 1)
    assert top_bits > 0
    out = np.zeros((n, L), np.uint16)
    need = np.ones(n, bool)
    while need.any():
        k = int(need.sum())
        cand = rng_np.integers(0, 1 << 15, size=(k, L), dtype=np.uint16)
        cand[:, L - 1] &= (1 << top_bits) - 1
        lt = np.zeros(k, bool)
        eq = np.ones(k, bool)
        for j in range(L - 1, -1, -1):
            lt |= eq & (cand[:, j] < r_limbs[j])
            eq &= cand[:, j] == r_limbs[j]
        out[need] = cand
        nxt = need.copy()
        nxt[need] = ~lt
        need = nxt
    return out


def _oracle_agg(curve, batch_u16, n_base):
    """Per-base-point scalar aggregates (mod order) for the clone-extension
    oracle, vectorized: limb-wise int64 column sums + one tiny python-int
    reconstruction per base point (replaces the 2^26-iteration python
    loop)."""
    n, L = batch_u16.shape
    reps = n // n_base
    sums = batch_u16.reshape(reps, n_base, L).astype(np.int64).sum(axis=0)
    assert reps < (1 << 48)  # int64 headroom: limb < 2^15, sum < reps*2^15
    return [sum(int(sums[i, k]) << (15 * k) for k in range(L)) % curve.order
            for i in range(n_base)]


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/zprize_tpu_jax_cache_tpu")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    metric = os.environ.get("BENCH_METRIC", "msm")
    if metric == "ntt":
        bench_ntt()
        return
    if metric == "ntt_dist":
        bench_ntt_dist()
        return
    if metric == "plonk":
        bench_plonk()
        return
    if metric == "posw":
        bench_posw()
        return
    if metric == "verify":
        bench_verify()
        return
    npow = int(os.environ.get("BENCH_NPOW", "18"))
    seed = int(os.environ.get("MSM_SEED", "42"))
    c_env = os.environ.get("BENCH_WINDOW")
    n = 1 << npow
    # untimed-init table cache: the point set is fully determined by
    # (seed, n), so repeated scale runs skip the ~19 min 2^26 host
    # assembly (the reference also preprocesses once per point set,
    # `benches/msm.rs:13-46`)
    os.environ.setdefault("ZPRIZE_PREP_CACHE", "/tmp/zprize_prep_cache")
    os.environ.setdefault("ZPRIZE_PREP_CACHE_KEY", f"seed{seed}")

    import jax
    import jax.numpy as jnp
    log(f"devices: {jax.devices()}")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from zprize_tpu.curve import sw
    from zprize_tpu.curve.spec import BLS12_377_G1
    from zprize_tpu.field import fp
    from zprize_tpu.msm import pippenger

    curve = BLS12_377_G1
    rng = random.Random(seed)

    # base points on host (python oracle), cloned to n
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "tests"))
    import ec_ref
    n_base = min(n, 1 << 10)
    t0 = time.time()
    from zprize_tpu.utils import native as _native
    base = (_native.point_chain(curve, seed % 1000, n_base)
            if _native.available()
            else ec_ref.random_subgroup_points(curve, n_base, seed=seed))
    log(f"generated {n_base} base points in {time.time()-t0:.1f}s")
    reps = n // n_base
    # pre-init point planes stay HOST-side (numpy): at 2^26 the affine
    # planes are 14 GB — the TE init consumes them in blocks, and the MSM
    # itself never reads them (only the precompute table + inf lanes)
    bxn = np.asarray(jax.device_get(fp.from_ints(curve.field,
                                                 [p[0] for p in base])))
    byn = np.asarray(jax.device_get(fp.from_ints(curve.field,
                                                 [p[1] for p in base])))
    px = np.tile(bxn, (reps, 1))
    py = np.tile(byn, (reps, 1))
    pinf = jnp.zeros((n,), bool)
    points = sw.Affine(px, py, pinf)

    c = int(c_env) if c_env else None

    def sync(x):
        # On the tunneled axon platform block_until_ready does not await
        # remote execution; force a (tiny) transfer to synchronize.
        return jax.device_get(x.z[..., 0])

    # untimed init: fixed-point preprocessing, exactly the reference split
    # (`multi_scalar_mult_init` is outside the timed region in
    # `yrrid/benches/msm.rs:13-46`)
    t0 = time.time()
    prepared = pippenger.prepare_points(curve, points, c)
    if prepared is not None:
        # sync via a TINY indexed element — .ravel()[0] materializes a
        # full relayout COPY of the table on device (10.7 GB at 2^26: the
        # r5 first 4x2^26 attempt OOM'd on exactly this line, AFTER a
        # successful 19-minute prepare)
        jax.device_get(prepared.packed[(0,) * prepared.packed.ndim])
        c = prepared.c
        log(f"prepared: c={c} G={prepared.g} m={prepared.m} "
            f"table={prepared.packed.nbytes / 1e9:.2f} GB")
        # the TE path reads only points.inf — drop the host affine planes
        points = sw.Affine(px[:1], py[:1], pinf)
        del px, py
    else:
        # short-Weierstrass fallback reads the affine planes on device
        points = sw.Affine(jnp.asarray(px), jnp.asarray(py), pinf)
        del px, py
        if c is None:
            c = pippenger.default_window_bits(n)
    log(f"point preprocessing (untimed init): {time.time()-t0:.1f}s")
    log(f"msm: n=2^{npow} c={c}")

    # scalars AFTER the table build: device-resident scalar planes during
    # `prepare_points` pushed the 2^26 run over HBM (table 10.5 GB + block
    # conversion temps + 2.25 GB scalars -> ResourceExhausted).  Compact
    # canonical u16 planes (half the HBM), generated vectorized on host.
    t0 = time.time()
    rng_np = np.random.default_rng(seed)
    batch0 = _scalar_batch_np(curve, rng_np, n)
    s = jax.device_put(jnp.asarray(batch0))
    log(f"scalar batch 0 built: {time.time()-t0:.1f}s")

    # warmup/compile
    t0 = time.time()
    res = pippenger.msm(curve, points, s, c=c, prepared=prepared)
    sync(res)
    log(f"first run (incl. compile): {time.time()-t0:.1f}s")

    # correctness: reduce to the base points (sum the scalars of each clone
    # mod r) and check against the native host oracle.
    def oracle_check(res_pt, batch_np) -> bool:
        agg = _oracle_agg(curve, batch_np, n_base)
        expect = None
        for pt, k in zip(base, agg):
            expect = ec_ref.ec_add(
                expect,
                _native.scalar_mul(curve, pt[0], pt[1], k)
                if _native.available()
                else ec_ref.ec_mul(pt, k, curve.field.p),
                curve.field.p)
        aff = sw.to_affine(curve, res_pt)
        got = (int(fp.to_ints(curve.field, aff.x)[()]),
               int(fp.to_ints(curve.field, aff.y)[()]))
        return got == expect

    if not oracle_check(res, batch0):
        log("RESULT MISMATCH — benchmark invalid")
        print(json.dumps({"metric": f"bls12_377_msm_points_per_s_2^{npow}",
                          "value": 0.0, "unit": "points/s",
                          "vs_baseline": 0.0, "error": "result mismatch"}))
        return
    log("result verified against host oracle")

    # steady-state over DISTINCT scalar batches (the reference's batched
    # workload: 4 x 2^26 over one prepared point set, benches/msm.rs:13-46).
    # Extra batches are staged HOST-side as numpy u16 planes: at 2^26 four
    # device-resident batches (4 x 2.25 GB) next to the 10.5 GB point table
    # would not fit HBM.  Each batch is device_put just before its timed
    # run (the reference also stages scalars outside the per-MSM timer).
    iters = int(os.environ.get("BENCH_ITERS", "3"))
    t0 = time.time()
    batches_np = [batch0]
    del s
    for _ in range(iters - 1):
        batches_np.append(_scalar_batch_np(curve, rng_np, n))
    log(f"staged {iters} scalar batches on host: {time.time()-t0:.1f}s")
    prof_dir = os.environ.get("BENCH_PROFILE")
    import contextlib
    prof = (jax.profiler.trace(prof_dir) if prof_dir
            else contextlib.nullcontext())
    times = []
    with prof:
        for k in range(iters):
            sk = jax.device_put(jnp.asarray(batches_np[k]))
            jax.device_get(sk[0, 0])           # finish the transfer
            # (not .ravel()[0]: that copies the whole 2.25 GB plane)
            t0 = time.time()
            res = pippenger.msm(curve, points, sk, c=c,
                                prepared=prepared)
            sync(res)
            times.append(time.time() - t0)
            log(f"iter {k}: {times[-1]*1e3:.1f} ms")   # survives a cutoff
            del sk
            # EVERY iteration's result checks against the host oracle
            # (outside the timed region; BENCH_VERIFY_ITERS=0 disables)
            if os.environ.get("BENCH_VERIFY_ITERS", "1") != "0":
                if not oracle_check(res, batches_np[k]):
                    log(f"ITER {k} RESULT MISMATCH — benchmark invalid")
                    print(json.dumps({
                        "metric": f"bls12_377_msm_points_per_s_2^{npow}",
                        "value": 0.0, "unit": "points/s",
                        "vs_baseline": 0.0,
                        "error": f"iter {k} result mismatch"}))
                    return
                log(f"iter {k}: result verified")
    dt = sum(times) / iters
    pts_per_s = n / dt
    log(f"steady-state: {dt*1e3:.1f} ms per MSM -> {pts_per_s:.3e} points/s "
        f"(min {min(times)*1e3:.1f} / max {max(times)*1e3:.1f} ms, "
        f"{iters} iters)")

    print(json.dumps({
        "metric": f"bls12_377_msm_points_per_s_2^{npow}",
        "value": pts_per_s,
        "unit": "points/s",
        "vs_baseline": pts_per_s / BASELINE_POINTS_PER_S,
    }))


if __name__ == "__main__":
    main()
