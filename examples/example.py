"""Narrow-band least-squares example driver (sequential API path).

Mirror of the reference driver (reference ``example.py``): broadband pass,
narrow-band pass, and the full figure set, written against the TPU-native
framework.  The reference fetches the 2018-12-19 Alaska meteor from IRIS
(``example.py:91``); with no network this driver synthesizes an equivalent
plane-wave event (or loads a cached .npz / hits IRIS when ObsPy and egress
exist).  Run:  python examples/example.py
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from narrow_band_least_squares_tpu import api
from narrow_band_least_squares_tpu.io import synthetic_plane_wave
from narrow_band_least_squares_tpu.io.stream import gather_waveforms
from narrow_band_least_squares_tpu.plotting import (
    broadband_filter_response_plot,
    broadband_plot,
    narrow_band_plot,
    narrow_band_processing_parameters_plot,
    narrow_band_stau_plot,
    narrow_band_lts_plot,
    narrow_band_lts_dropped_station_plot,
)
from scipy import signal

##############################################################################
### User Input (same knobs as the reference driver, example.py:38-72) ###
SOURCE = "IRIS"
NETWORK = "IM"
STATION = "I53H?"
LOCATION = "*"
CHANNEL = "BDF"
START = "2018-12-19T01:45:00"
END_OFFSET_S = 20 * 60

FMIN = 0.1
FMAX = 5.0
NBANDS = 8
FREQ_BAND_TYPE = "log"
FILTER_TYPE = "cheby1"
FILTER_ORDER = 2
FILTER_RIPPLE = 0.01

WINOVER = 0.5
WINDOW_LENGTH_TYPE = "adaptive"
WINLEN = 50
WINLEN_1 = 60
WINLEN_X = 30

ALPHA = 1.0
MDCCM_THRESH = 0.6
PLOT_ARRAY_COORDINATES = False

file_type = ".png"
dpi_num = 300
##############################################################################

FIG_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "example_figures")
os.makedirs(FIG_DIR, exist_ok=True)


def get_stream():
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "event_cache.npz")
    try:
        from narrow_band_least_squares_tpu.utils.timeutils import parse_utc

        return gather_waveforms(
            SOURCE, NETWORK, STATION, LOCATION, CHANNEL,
            START, parse_utc(START) + END_OFFSET_S,
            remove_response=True, cache=cache,
        )
    except (ImportError, OSError) as e:
        # no ObsPy AND no network (offline box); URLError/socket errors
        # are OSError.  Configuration errors (bad station list, etc.)
        # still propagate rather than silently yielding synthetic data.
        print(f"acquisition unavailable ({type(e).__name__}) -> "
              "synthesizing the example event")
        return synthetic_plane_wave(
            nchans=8, duration_s=END_OFFSET_S, fs=20.0, baz_deg=230.0,
            trace_vel_kms=0.34, f0=0.8, bandwidth=1.4, snr=6.0, seed=42,
        )


def main():
    st = get_stream()
    latlist, lonlist = st.latitudes, st.longitudes
    nchans = st.nchans
    rij = api.get_rij(latlist, lonlist, nchans)

    ### Broadband least-squares ###
    stf_broad, Fs, sos = api.filter_data(
        st, FILTER_TYPE, FMIN, FMAX, FILTER_ORDER, FILTER_RIPPLE
    )
    (vel_b, baz_b, t_b, mdccm_b, stdict_b, sig_tau_b, vu_b, bu_b) = api.ltsva(
        stf_broad, latlist, lonlist, WINLEN, WINOVER, ALPHA,
        PLOT_ARRAY_COORDINATES,
    )
    fig = broadband_plot(
        stf_broad, vel_b, baz_b, mdccm_b, t_b, MDCCM_THRESH, ALPHA,
        stdict_b, sig_tau_b,
    )
    fig.savefig(os.path.join(FIG_DIR, "Broadband_Least_Squares"), dpi=dpi_num)
    plt.close(fig)

    freq_resp_list = np.logspace(
        math.log(0.01, 10), math.log(Fs / 2, 10), num=1000
    )
    w_broad, h_broad = signal.sosfreqz(sos, freq_resp_list, fs=Fs)
    fig = broadband_filter_response_plot(
        w_broad, h_broad, FMIN, FMAX, FILTER_TYPE, FILTER_ORDER, FILTER_RIPPLE
    )
    fig.savefig(
        os.path.join(FIG_DIR, "Filter_Frequency_Response_Broadband"), dpi=dpi_num
    )
    plt.close(fig)

    ### Narrow-band least-squares ###
    freqlist, nbands, fmax = api.get_freqlist(FMIN, FMAX, FREQ_BAND_TYPE, NBANDS)
    WINLEN_list = api.get_winlenlist(
        WINDOW_LENGTH_TYPE, nbands, WINLEN, WINLEN_1, WINLEN_X
    )
    (vel_array, baz_array, mdccm_array, t_array, stdict_all, sig_tau_array,
     num_compute_list, w_array, h_array) = api.narrow_band_least_squares(
        WINLEN_list, WINOVER, ALPHA, st, latlist, lonlist, nbands,
        w_broad, h_broad, freqlist, FREQ_BAND_TYPE, freq_resp_list,
        FILTER_TYPE, FILTER_ORDER, FILTER_RIPPLE,
    )

    fig = narrow_band_plot(
        FMIN, fmax, stf_broad, nbands, freqlist, FREQ_BAND_TYPE,
        vel_array, baz_array, mdccm_array, t_array, num_compute_list,
        MDCCM_THRESH,
    )
    fig.savefig(os.path.join(FIG_DIR, "Narrow_Band_Least_Squares"), dpi=dpi_num)
    plt.close(fig)

    if ALPHA == 1.0:
        fig = narrow_band_stau_plot(
            FMIN, fmax, stf_broad, nbands, freqlist, FREQ_BAND_TYPE,
            vel_array, baz_array, mdccm_array, t_array, sig_tau_array,
            num_compute_list, MDCCM_THRESH, ALPHA,
        )
        fig.savefig(
            os.path.join(FIG_DIR, "Narrow_Band_Least_Squares_Sigma_Tau"),
            dpi=dpi_num,
        )
        plt.close(fig)
    else:
        fig = narrow_band_lts_plot(
            FMIN, fmax, stf_broad, nbands, freqlist, FREQ_BAND_TYPE,
            vel_array, baz_array, mdccm_array, t_array, stdict_all,
            num_compute_list, MDCCM_THRESH, ALPHA,
        )
        fig.savefig(
            os.path.join(FIG_DIR, "Narrow_Band_Least_Squares_LTS"), dpi=dpi_num
        )
        plt.close(fig)
        fig = narrow_band_lts_dropped_station_plot(
            FMIN, fmax, stf_broad, nbands, freqlist, FREQ_BAND_TYPE,
            vel_array, baz_array, mdccm_array, t_array, stdict_all,
            num_compute_list, MDCCM_THRESH,
        )
        fig.savefig(
            os.path.join(FIG_DIR, "Narrow_Band_Least_Squares_LTS_Dropped_Stations"),
            dpi=dpi_num,
        )
        plt.close(fig)

    fig = narrow_band_processing_parameters_plot(
        rij, FREQ_BAND_TYPE, freqlist, WINLEN_list, nbands, FMIN, fmax,
        w_array, h_array, FILTER_TYPE, FILTER_ORDER, FILTER_RIPPLE,
    )
    fig.savefig(
        os.path.join(FIG_DIR, "Narrow_Band_Processing_Parameters"), dpi=dpi_num
    )
    plt.close(fig)
    print(f"Figures written to {FIG_DIR}")


if __name__ == "__main__":
    main()
