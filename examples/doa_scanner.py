"""Direction finding on a ULA: Bartlett vs MVDR vs MUSIC side by side.

Runs on CPU or TPU:  python examples/doa_scanner.py

Synthesizes snapshots from an 8-element half-wavelength array with three
sources (two of them only 8 degrees apart — inside the conventional
beamwidth), runs all three spatial spectra through models.beamform (one
MXU covariance matmul + real-embedded Cholesky/eigh subspace math) and
prints each method's bearing estimates, then repeats with two fully
COHERENT sources to show forward-backward averaging restoring MUSIC.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from digital_signal_processsing_tpu.models import ArrayConfig, beamform


def main() -> None:
    cfg = ArrayConfig(n_sensors=8, spacing=0.5, n_grid=721)
    truth = np.array([-40.0, 12.0, 20.0])  # last two inside one beamwidth
    xi, xq = beamform.synthesize(cfg, truth, n_snapshots=512, snr_db=10.0, seed=3)

    print(f"ULA: {cfg.n_sensors} elements @ {cfg.spacing} wavelengths, "
          f"512 snapshots, 10 dB SNR")
    print(f"truth bearings: {truth}")
    for method in ("bartlett", "mvdr", "music"):
        est = beamform.estimate_doa(cfg, xi, xq, n_sources=3, method=method)
        err = np.abs(est - truth).max()
        print(f"  {method:9s} -> {np.round(est, 2)}   (max error {err:.2f} deg)")

    # coherent multipath: the same waveform from two bearings collapses the
    # signal subspace to rank 1; persymmetric forward-backward averaging
    # restores the second dimension at zero extra snapshot cost
    truth2 = np.array([-30.0, 25.0])
    ci, cq = beamform.synthesize(
        cfg, truth2, n_snapshots=512, snr_db=20.0, seed=4, coherent=True
    )
    plain = beamform.estimate_doa(cfg, ci, cq, n_sources=2, method="music")
    fb = beamform.estimate_doa(
        cfg, ci, cq, n_sources=2, method="music", forward_backward=True
    )
    print(f"coherent pair at {truth2}:")
    print(f"  music (plain)            -> {np.round(plain, 2)}")
    print(f"  music (forward-backward) -> {np.round(fb, 2)}")


if __name__ == "__main__":
    main()
