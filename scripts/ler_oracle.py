"""Independent LER oracle: run the reference's own pure-Python trial path.

Root-causes the VALIDATION.md deviations ([[90]] p=0.004 z=+3.0 vs archive,
[[288]] uniformly lower than archive) with evidence instead of inference, in
three separable phases:

  sample     Reference sampling (generate_noisy_circuit + pure-python
             Pauli-frame propagation + sparsify, reference
             src/noise/model.py:4-57 + src/noise/simulation.py:114-229),
             seeded exactly like reference trials (np.random.seed(base+t),
             engine.py:125). Writes (syndrome, true_logical) per trial/basis.
  ourdecode  Decode those syndromes with OUR production decode path
             (qldpc_tpu.parallel.engine._decode_one_basis). If this LER
             matches our full-pipeline LER, our sampler is distributionally
             equivalent to the reference's.
  refdecode  Decode a subset of the same syndromes with the reference's own
             BP+OSD (numba shimmed to pure Python — slow) and compare
             OUTCOMES trial-by-trial against `ourdecode`. Exact agreement
             verifies the decode composition at trial level.

Usage (CPU env; ourdecode may also run on TPU):
  env QLDPC_TEST_REEXEC=1 PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      python scripts/ler_oracle.py sample --code "[[90, 8, 10]]" --cycles 10 \
      --p 0.004 --n 4000 --seed 7
  python scripts/ler_oracle.py ourdecode --code "[[90, 8, 10]]" --cycles 10 \
      --p 0.004 --max-iter 20 --osd-order 2
  env ... python scripts/ler_oracle.py refdecode --code "[[90, 8, 10]]" \
      --cycles 10 --p 0.004 --n 16 --max-iter 20 --osd-order 2
"""
import argparse
import hashlib
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numba_shim  # noqa: E402

REF = "/root/reference"
OUT_DIR = os.path.join(os.path.dirname(__file__), "oracle_data")


def ref_modules():
    numba_shim.install()
    sys.path.insert(0, REF)
    from src.codes.bb_code import BBCodeCircuit
    from src.noise.model import generate_noisy_circuit
    from src.noise.simulation import (extract_data_qubit_state,
                                      simulate_circuit_X, simulate_circuit_Z,
                                      sparsify_syndrome)
    return (BBCodeCircuit, generate_noisy_circuit, simulate_circuit_Z,
            simulate_circuit_X, sparsify_syndrome, extract_data_qubit_state)


def load_code(name):
    return np.load(os.path.join(REF, "codes", f"{name}.npz"))


def load_golden(code, cycles, p):
    h = hashlib.sha256()
    for k in ["Hx", "Hz", "Lx", "Lz"]:
        h.update(code[k].tobytes())
    h.update(str(cycles).encode())
    h.update(f"{p:.6f}".encode())
    path = os.path.join(REF, "matrix_cache",
                        f"matrices_{h.hexdigest()[:16]}.npz")
    return np.load(path)


def data_path(name, cycles, p):
    tag = name.replace(" ", "").replace(",", "_")
    return os.path.join(OUT_DIR, f"trials_{tag}_c{cycles}_p{p:g}.npz")


def make_circuit(code, cycles, BBCodeCircuit):
    kw = {}
    for k in ("ell", "m", "a_x_powers", "a_y_powers",
              "b_y_powers", "b_x_powers"):
        if k in code:
            v = code[k]
            kw[k] = int(v) if np.ndim(v) == 0 else np.asarray(v)
    return BBCodeCircuit(code["Hx"], code["Hz"], num_cycles=cycles, **kw)


def cmd_sample(args):
    (BBCodeCircuit, gen_noisy, sim_z, sim_x, sparsify, extract) = ref_modules()
    code = load_code(args.code)
    cb = make_circuit(code, args.cycles, BBCodeCircuit)
    base = cb.get_full_circuit()
    suffix = cb.cycle * 2
    Lx, Lz = code["Lx"], code["Lz"]
    syn_zs, syn_xs, true_zs, true_xs = [], [], [], []
    t0 = time.time()
    for t in range(args.n):
        # exactly the reference per-trial sampling (engine.py:124-129)
        np.random.seed(args.seed + t)
        noisy = gen_noisy(base, args.p)
        full = noisy + suffix
        syn_z, state_z, map_z, _ = sim_z(full, cb.lin_order, cb.n, cb.Xchecks)
        true_zs.append((Lx @ extract(state_z, cb.lin_order, cb.data_qubits)) % 2)
        syn_zs.append(sparsify(syn_z, map_z, cb.Xchecks))
        syn_x, state_x, map_x, _ = sim_x(full, cb.lin_order, cb.n, cb.Zchecks)
        true_xs.append((Lz @ extract(state_x, cb.lin_order, cb.data_qubits)) % 2)
        syn_xs.append(sparsify(syn_x, map_x, cb.Zchecks))
        if (t + 1) % 200 == 0:
            print(f"  {t + 1}/{args.n} trials ({time.time() - t0:.0f}s)",
                  flush=True)
    os.makedirs(OUT_DIR, exist_ok=True)
    np.savez_compressed(
        data_path(args.code, args.cycles, args.p),
        syn_z=np.array(syn_zs, dtype=np.uint8),
        syn_x=np.array(syn_xs, dtype=np.uint8),
        true_z=np.array(true_zs, dtype=np.uint8),
        true_x=np.array(true_xs, dtype=np.uint8),
        seed=args.seed, p=args.p, cycles=args.cycles)
    print(f"wrote {data_path(args.code, args.cycles, args.p)} "
          f"({args.n} trials, {time.time() - t0:.0f}s)")


def cmd_ourdecode(args):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import jax
    import jax.numpy as jnp
    from qldpc_tpu.models.bb import make_code
    from qldpc_tpu.models.circuit import SyndromeCircuit
    from qldpc_tpu.ops.bp import alpha_schedule
    from qldpc_tpu.parallel.engine import (_decode_one_basis, _make_basis,
                                           ensure_sampler_metadata)

    code = load_code(args.code)
    golden = load_golden(code, args.cycles, args.p)
    data = np.load(data_path(args.code, args.cycles, args.p))
    N = data["syn_z"].shape[0]

    bb_kw = {k: (int(code[k]) if np.ndim(code[k]) == 0 else
                 np.asarray(code[k]))
             for k in ("ell", "m", "a_x_powers", "a_y_powers",
                       "b_y_powers", "b_x_powers") if k in code}
    qcode = make_code(code["Hx"], code["Hz"], code["Lx"], code["Lz"], **bb_kw)
    circ = SyndromeCircuit(qcode, num_cycles=args.cycles)
    matrices = ensure_sampler_metadata(
        {k: golden[k] for k in golden.files}
        | {"first_logical_rowZ": int(golden["first_logical_rowZ"][0]),
           "first_logical_rowX": int(golden["first_logical_rowX"][0]),
           "num_cycles": int(golden["num_cycles"][0]),
           "k": int(golden["k"][0])},
        circ, qcode.Lx, qcode.Lz, args.p)
    seq = alpha_schedule("dynamical", args.max_iter)

    use_pallas = jax.default_backend() != "cpu"
    msg_dtype = jnp.bfloat16 if use_pallas else jnp.float32
    B = 256 if N >= 256 else N
    out = {}
    for basis, skey, tkey in (("Z", "syn_z", "true_z"), ("X", "syn_x", "true_x")):
        dec = _make_basis(circ, matrices, basis, seq, osd_order=args.osd_order)
        syn = data[skey].astype(np.uint8)
        tru = data[tkey].astype(np.uint8)
        pad = (-N) % B
        if pad:
            syn = np.concatenate([syn, np.zeros((pad,) + syn.shape[1:], np.uint8)])
            tru = np.concatenate([tru, np.zeros((pad,) + tru.shape[1:], np.uint8)])
        fn = jax.jit(lambda s, t, d: _decode_one_basis(
            s, t, d, args.max_iter, args.osd_order, 1.0, 20.0,
            use_pallas, msg_dtype)[0])
        errs = []
        t0 = time.time()
        for c in range(0, len(syn), B):
            errs.append(np.asarray(fn(jnp.asarray(syn[c:c + B]),
                                      jnp.asarray(tru[c:c + B]), dec)))
        e = np.concatenate(errs)[:N]
        out[basis] = e
        print(f"{basis}: {int(e.sum())}/{N} = {e.mean():.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)
    any_err = out["Z"] | out["X"]
    ler = float(any_err.mean())
    res = dict(code=args.code, p=args.p, cycles=args.cycles, n=N,
               max_iter=args.max_iter, osd_order=args.osd_order,
               z_ler=float(out["Z"].mean()), x_ler=float(out["X"].mean()),
               ler=ler, errors=int(any_err.sum()),
               sigma=float(np.sqrt(ler * (1 - ler) / N)))
    print(json.dumps(res))
    tag = data_path(args.code, args.cycles, args.p).replace(
        ".npz", f"_ourdecode_mi{args.max_iter}.npz")
    np.savez(tag, z_err=out["Z"], x_err=out["X"])
    print("per-trial flags:", tag)


def cmd_refdecode(args):
    (_, _, _, _, _, _) = ref_modules()
    from scipy.sparse import csr_matrix
    from src.decoding.dense import performMinSum_Symmetric
    from src.decoding.osd import performOSD_enhanced
    from src.decoding.sparse import performMinSum_Symmetric_Sparse

    code = load_code(args.code)
    golden = load_golden(code, args.cycles, args.p)
    data = np.load(data_path(args.code, args.cycles, args.p))
    N = min(args.n, data["syn_z"].shape[0])
    k = code["Lx"].shape[0]

    results = {}
    for basis, skey, tkey, Hkey, Fkey, Pkey, frkey in (
            ("Z", "syn_z", "true_z", "HdecZ", "HZ_full", "channel_probsZ",
             "first_logical_rowZ"),
            ("X", "syn_x", "true_x", "HdecX", "HX_full", "channel_probsX",
             "first_logical_rowX")):
        H = np.asarray(golden[Hkey], dtype=np.float64, order="C")
        first = int(golden[frkey][0])
        H_logical = np.ascontiguousarray(golden[Fkey][first:first + k])
        with np.errstate(divide="ignore", invalid="ignore"):
            llrs = np.clip(np.nan_to_num(
                np.log((1 - golden[Pkey]) / golden[Pkey])), -50, 50)
        use_sparse = H.shape[1] > 5000
        H_csr = csr_matrix(H) if use_sparse else None
        errs = []
        for t in range(N):
            t0 = time.time()
            syn = data[skey][t].astype(np.int64)
            if use_sparse:
                det, succ, post, _ = performMinSum_Symmetric_Sparse(
                    H_csr, syn, llrs, maxIter=args.max_iter, alpha=0,
                    alpha_mode="dynamical")
            else:
                det, succ, post, _ = performMinSum_Symmetric(
                    H, syn, llrs, maxIter=args.max_iter, alpha=0,
                    alpha_mode="dynamical")
            if not succ:
                det = performOSD_enhanced(np.asarray(golden[Hkey]), syn, post,
                                          det, order=args.osd_order)
            dec = (H_logical @ det) % 2
            err = not np.array_equal(dec, data[tkey][t].astype(np.int64))
            errs.append(bool(err))
            print(f"{basis} trial {t}: conv={bool(succ)} err={err} "
                  f"({time.time() - t0:.0f}s)", flush=True)
        results[basis] = np.array(errs)

    ours_file = data_path(args.code, args.cycles, args.p).replace(
        ".npz", f"_ourdecode_mi{args.max_iter}.npz")
    summary = dict(code=args.code, p=args.p, n=N,
                   z_err=[bool(b) for b in results["Z"]],
                   x_err=[bool(b) for b in results["X"]])
    if os.path.exists(ours_file):
        ours = np.load(ours_file)
        za = (ours["z_err"][:N] == results["Z"])
        xa = (ours["x_err"][:N] == results["X"])
        summary["z_agree"] = f"{int(za.sum())}/{N}"
        summary["x_agree"] = f"{int(xa.sum())}/{N}"
        summary["z_disagree_trials"] = np.nonzero(~za)[0].tolist()
        summary["x_disagree_trials"] = np.nonzero(~xa)[0].tolist()
    print(json.dumps(summary))


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name, fn in (("sample", cmd_sample), ("ourdecode", cmd_ourdecode),
                     ("refdecode", cmd_refdecode)):
        p = sub.add_parser(name)
        p.add_argument("--code", required=True)
        p.add_argument("--cycles", type=int, required=True)
        p.add_argument("--p", type=float, required=True)
        p.add_argument("--n", type=int, default=1000)
        p.add_argument("--seed", type=int, default=7)
        p.add_argument("--max-iter", type=int, default=20)
        p.add_argument("--osd-order", type=int, default=2)
        p.set_defaults(fn=fn)
    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
