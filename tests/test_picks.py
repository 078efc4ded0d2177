"""Pick-selection semantics (`ops.picks.find_picks` / `get_picks`).

The oracles below restate the reference's selection rules
(BPMF/utils.py:2039-2200) directly — per-peak loops, explicit filters —
and the vectorized implementations must reproduce them exactly.
"""

import numpy as np
import pandas as pd
import pytest

from seismic_bpmf_tpu.ops.picks import find_picks, get_picks


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _find_picks_oracle(prob, threshold):
    from scipy.signal import find_peaks

    peaks, props = find_peaks(prob, height=threshold, width=1,
                              prominence=0.9 * threshold)
    values, means, stds = [], [], []
    for i in range(len(peaks)):
        samples = np.arange(int(props["left_ips"][i]),
                            int(props["right_ips"][i]) + 1)
        p = prob[samples]
        mean = np.sum(samples * p) / p.sum()
        std = np.sqrt(np.sum((samples - mean) ** 2) / p.sum())
        values.append(prob[peaks[i]])
        means.append(mean)
        stds.append(std)
    return np.asarray(values), np.asarray(means), np.asarray(stds)


def test_find_picks_matches_oracle(rng):
    n = 6000
    prob = np.zeros(n)
    # overlapping Gaussian bumps of different widths/heights
    for center, width, h in [(500, 20, 0.9), (1500, 60, 0.6),
                             (1545, 15, 0.55), (4000, 35, 0.95)]:
        t = np.arange(n)
        prob += h * np.exp(-((t - center) ** 2) / (2 * width**2))
    prob += 0.01 * rng.random(n)
    v, m, s = find_picks(prob, 0.3)
    vo, mo, so = _find_picks_oracle(prob, 0.3)
    np.testing.assert_allclose(v, vo, rtol=1e-12)
    np.testing.assert_allclose(m, mo, rtol=1e-12)
    np.testing.assert_allclose(s, so, rtol=1e-9)
    assert len(v) >= 3


def test_find_picks_empty():
    v, m, s = find_picks(np.zeros(100), 0.5)
    assert len(v) == len(m) == len(s) == 0


def test_find_picks_day_scale_indexes():
    """Pick uncertainties at day-scale absolute sample indexes must match
    the same peak at a small index (sum(k^2) closed forms evaluated at
    k ~ 8.6e6 catastrophically cancel in float64 unless the index origin
    is shifted to the peak)."""
    off = 8_640_000  # one day at 100 Hz
    t = np.arange(3000)
    bump = 0.9 * np.exp(-((t - 1500) ** 2) / (2 * 25.0**2))
    near = np.zeros(4000)
    near[500:3500] = bump
    far = np.zeros(off + 4000)
    far[off + 500 : off + 3500] = bump
    v1, m1, s1 = find_picks(near, 0.3)
    v2, m2, s2 = find_picks(far, 0.3)
    assert len(v1) == len(v2) == 1
    np.testing.assert_allclose(v2, v1, rtol=1e-12)
    np.testing.assert_allclose(m2 - off, m1, atol=1e-6)
    assert np.all(np.isfinite(s2))
    np.testing.assert_allclose(s2, s1, rtol=1e-9)


def _mkpicks(data):
    rows = {}
    for sta, d in data.items():
        rows[sta] = {
            f"{ph}_{c}": np.asarray(d[f"{ph}_{c}"], float)
            for ph in ("P", "S") for c in ("picks", "probas", "unc")
        }
    df = pd.DataFrame.from_dict(rows, orient="index")
    df.index.name = "stations"
    return df


class TestGetPicks:
    def test_s_first_then_best_p_before_s(self):
        picks = _mkpicks({
            "ST1": {
                # best P overall (0.9) is AFTER the best S -> must fall
                # back to the best P before S (0.4 at 200)
                "P_picks": [200.0, 800.0], "P_probas": [0.4, 0.9],
                "P_unc": [2.0, 3.0],
                "S_picks": [600.0, 300.0], "S_probas": [0.8, 0.3],
                "S_unc": [5.0, 4.0],
            },
        })
        out = get_picks(picks, buffer_length=50)
        assert out.loc["ST1", "S_picks"] == 600.0
        assert out.loc["ST1", "P_picks"] == 200.0
        assert out.loc["ST1", "P_probas"] == pytest.approx(0.4)
        assert out.loc["ST1", "P_unc"] == pytest.approx(2.0)

    def test_buffer_filter_and_empty(self):
        picks = _mkpicks({
            "ST1": {
                # the only P trigger is inside the buffer -> NaN P
                "P_picks": [30.0], "P_probas": [0.9], "P_unc": [1.0],
                "S_picks": [400.0], "S_probas": [0.7], "S_unc": [2.0],
            },
            "ST2": {  # no triggers at all
                "P_picks": [], "P_probas": [], "P_unc": [],
                "S_picks": [], "S_probas": [], "S_unc": [],
            },
        })
        out = get_picks(picks, buffer_length=50)
        assert np.isnan(out.loc["ST1", "P_picks"])
        assert out.loc["ST1", "S_picks"] == 400.0
        assert np.isnan(out.loc["ST2", "S_picks"])
        assert np.isnan(out.loc["ST2", "P_picks"])

    def test_no_s_keeps_unconstrained_best_p(self):
        picks = _mkpicks({
            "ST1": {
                "P_picks": [200.0, 900.0], "P_probas": [0.2, 0.8],
                "P_unc": [1.0, 2.0],
                "S_picks": [], "S_probas": [], "S_unc": [],
            },
        })
        out = get_picks(picks, buffer_length=0)
        assert out.loc["ST1", "P_picks"] == 900.0
        assert np.isnan(out.loc["ST1", "S_picks"])

    def test_gaussian_prior_reweighting(self):
        picks = _mkpicks({
            "ST1": {
                "P_picks": [100.0, 500.0], "P_probas": [0.5, 0.6],
                "P_unc": [1.0, 1.0],
                "S_picks": [600.0, 1000.0], "S_probas": [0.5, 0.6],
                "S_unc": [1.0, 1.0],
            },
        })
        prior = pd.DataFrame({"P": [100.0], "S": [600.0]}, index=["ST1"])
        out = get_picks(picks, buffer_length=0, prior_knowledge=prior,
                        search_win_samp=50)
        # the prior overrides the slightly-higher raw probabilities
        assert out.loc["ST1", "P_picks"] == 100.0
        assert out.loc["ST1", "S_picks"] == 600.0
        # without the prior, the 0.6 triggers win
        out2 = get_picks(picks, buffer_length=0)
        assert out2.loc["ST1", "S_picks"] == 1000.0
        assert out2.loc["ST1", "P_picks"] == 500.0

    def test_output_dtype_float32(self):
        picks = _mkpicks({
            "ST1": {
                "P_picks": [200.0], "P_probas": [0.4], "P_unc": [2.0],
                "S_picks": [600.0], "S_probas": [0.8], "S_unc": [5.0],
            },
        })
        out = get_picks(picks, buffer_length=0)
        assert all(out[c].dtype == np.float32 for c in out.columns)
