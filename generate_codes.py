"""Generate BB code npz files from their defining polynomials.

Self-contained equivalent of the reference's offline generator
(reference generate_codes.py:16-172, which depends on the external `qldpc`
package): parity checks are reconstructed from the polynomial powers via
kron/roll and logical operators are derived with GF(2) linear algebra.
Output format matches the reference's codes/*.npz exactly (same keys), and
the Hx/Hz/polynomial content is byte-identical; the logical-operator rows
Lx/Lz are an independently derived (self-checked) symplectic basis — valid
logicals are not unique, and the logical-error criterion ("any logical
mismatch") is basis-invariant. Golden comparisons against the reference's
matrix_cache use the reference's own Lx/Lz (tests/test_builder.py).
Hx/Hz are verified against the polynomial reconstruction.
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from qldpc_tpu import CODE_REGISTRY, get_code


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out-dir", default="codes")
    ap.add_argument("--codes", nargs="*", default=None,
                    help="subset of registry names (default: all)")
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    names = args.codes or list(CODE_REGISTRY)
    print("Generating BB code matrices with component parameters...")
    print("=" * 60)
    for name in names:
        code = get_code(name)
        code.validate()
        # polynomial-reconstruction self-check (reference
        # generate_codes.py:91-128 semantics)
        A = np.bitwise_xor.reduce(np.stack(code.A_components()), axis=0)
        B = np.bitwise_xor.reduce(np.stack(code.B_components()), axis=0)
        assert np.array_equal(np.hstack([A, B]), code.Hx), name
        path = os.path.join(args.out_dir, f"{name}.npz")
        code.save_npz(path)
        print(f"{name}: Hx {code.Hx.shape}, k={code.k} -> {path}")
    if args.codes is None:
        # the reference also ships codes/steane.npz (Hx/Hz only — no
        # script loads it; /root/reference/codes/steane.npz has exactly
        # these two keys)
        from qldpc_tpu.parallel.code_capacity import steane_code
        Hx, Hz, _, _ = steane_code()
        # the reference file lists the Hamming rows most-significant-last;
        # keep its exact row order for byte parity
        Hx, Hz = Hx[::-1], Hz[::-1]
        steane_path = os.path.join(args.out_dir, "steane.npz")
        np.savez(steane_path, Hx=Hx.astype(np.int64), Hz=Hz.astype(np.int64))
        print(f"steane: Hx {Hx.shape} -> {steane_path}")
    print("=" * 60)
    print("Done!")


if __name__ == "__main__":
    main()
