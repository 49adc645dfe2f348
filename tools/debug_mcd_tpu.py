"""One-off bisection driver for the TPU-vs-reference MCD regression.

Round-5: bench's first on-chip `mcd_vs_reference_db` printed 20.55 dB where
the same recipe on CPU prints 0.425. This runs the shared recipe with our-side
hparam overrides toggling each auto-ON TPU path, prints wav stats, and saves
the wav pairs for offline analysis.

    python tools/debug_mcd_tpu.py [--configs default no_pallas_wavenet ...]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = {
    "default": {},
    "no_pallas_wavenet": {"use_pallas_wavenet": False},
    "no_nsf_packed": {"nsf_packed": False},
    "neither": {"use_pallas_wavenet": False, "nsf_packed": False},
    "f32_weights": {"pallas_wavenet_dtype": "float32",
                    "nsf_fused_res_dtype": "float32"},
    # "_matmul_precision" is handled here, not an hparam: pins XLA:TPU's
    # internal bf16 matmul/conv passes to f32 for the whole render
    "pin_matmul": {"_matmul_precision": "highest"},
    "pin_all": {"_matmul_precision": "highest",
                "pallas_wavenet_dtype": "float32",
                "nsf_fused_res_dtype": "float32"},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", nargs="*", default=["default"])
    ap.add_argument("--scale", default="bench")
    args = ap.parse_args()

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
    from mcd_reference import mcd_vs_reference

    try:
        from prodiff_tpu.utils.jax_cache import enable_persistent_cache

        enable_persistent_cache()
    except Exception:
        pass

    import jax

    for name in args.configs:
        over = dict(CONFIGS[name])
        prec = over.pop("_matmul_precision", None)
        jax.config.update("jax_default_matmul_precision", prec)
        d = tempfile.mkdtemp(prefix=f"prodiff_mcdbg_{name}_")
        try:
            out = mcd_vs_reference(d, scale=args.scale,
                                   ours_overrides=over,
                                   return_wavs=True)
            got, want = out.pop("got_wav"), out.pop("want_wav")
            np.savez(f"/tmp/mcdbg_{name}.npz", got=got, want=want)
            stats = {
                "got_rms": float(np.sqrt(np.mean(got ** 2))),
                "want_rms": float(np.sqrt(np.mean(want ** 2))),
                "got_max": float(np.abs(got).max()),
                "want_max": float(np.abs(want).max()),
                "corr": float(np.corrcoef(got, want)[0, 1]),
            }
            print(name, json.dumps(out), json.dumps(stats), flush=True)
        finally:
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
