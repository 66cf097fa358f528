"""Continuous-monitoring example: the reference's weeks/months workflow.

The reference handles long durations by manually re-running per segment,
appending text files and re-reading them for ``baz_freq_plot`` (SURVEY
§3.5).  Here the same workflow is `StreamingMonitor`: segmented processing
with checkpoint/resume + the same TSV format, then the monitoring figure.

Run:  python examples/example_monitoring.py
(Re-running resumes: already-processed segments are skipped.)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from narrow_band_least_squares_tpu.io import synthetic_plane_wave
from narrow_band_least_squares_tpu.models.streaming import StreamingMonitor
from narrow_band_least_squares_tpu.plotting import (
    baz_freq_plot,
    monitoring_uncertainty_plot,
)
from narrow_band_least_squares_tpu.utils.geometry import get_rij
from narrow_band_least_squares_tpu.utils.plan import (
    get_freqlist,
    get_winlenlist,
    make_plan,
)

FMIN, FMAX, NBANDS = 0.1, 5.0, 8
SEGMENT_S = 1200.0
HOURS = 6.0
MDCCM_THRESH = 0.6

HERE = os.path.dirname(os.path.abspath(__file__))
SAVE_DIR = os.path.join(HERE, "monitoring_out")
FIG_DIR = os.path.join(HERE, "example_figures")


def main():
    os.makedirs(FIG_DIR, exist_ok=True)

    # a long stream whose source direction drifts between segments would be
    # the real use case; the synthetic source is fixed at 230 deg
    st = synthetic_plane_wave(
        nchans=8, duration_s=HOURS * 3600.0, fs=20.0, baz_deg=230.0,
        trace_vel_kms=0.34, f0=0.8, bandwidth=1.4, snr=6.0, seed=42,
    )
    freqlist, nbands, fmax = get_freqlist(FMIN, FMAX, "log", NBANDS)
    winlens = get_winlenlist("adaptive", nbands, 50, 60, 30)
    plan = make_plan(freqlist, "log", winlens, 0.5, int(SEGMENT_S * st.fs), st.fs)
    rij = get_rij(st.latitudes, st.longitudes, st.nchans)

    mon = StreamingMonitor(plan, rij, SAVE_DIR, freqlist, alpha=1.0)
    recs = mon.process(st)  # resume-aware
    print(f"processed {len(recs)} new segments (resume skips existing)")

    vel, baz, mdccm, t, num, extras = mon.read_all(extras=True)
    fig = baz_freq_plot(
        FMIN, fmax, nbands, freqlist, vel, baz, mdccm, t, num, MDCCM_THRESH
    )
    out = os.path.join(FIG_DIR, "Monitoring_Backazimuth_vs_Frequency.png")
    fig.savefig(out, dpi=200)
    plt.close(fig)

    # the npz sidecars carry what the TSV format cannot: per-window
    # uncertainties (and LTS flags) for the long-duration raster
    fig = monitoring_uncertainty_plot(
        FMIN, fmax, nbands, freqlist, extras["vel_uncert"],
        extras["baz_uncert"], mdccm, t, num, MDCCM_THRESH,
        flags=extras.get("flags"),
    )
    out2 = os.path.join(FIG_DIR, "Monitoring_Uncertainty_vs_Frequency.png")
    fig.savefig(out2, dpi=200)
    plt.close(fig)

    good = mdccm > MDCCM_THRESH
    print(
        f"{int(good.sum())} confident windows over {HOURS} h; "
        f"median baz {np.median(baz[good]):.1f} deg; figure -> {out}"
    )


if __name__ == "__main__":
    main()
