"""Glue to the external NLLoc locator (http://alomax.free.fr/nlloc/).

Reference parity: BPMF/NLLoc_utils.py (639 LoC) + `Event.relocate_NLLoc`
(BPMF/dataset.py:2271-2462).  The file contracts (obs/control/travel-time
grids, .hyp parsing incl. the left->right-handed covariance flip) are
byte-compatible with the reference so existing NLLoc setups keep working;
the subprocess choreography is simplified (temp working directories, no
lock files).
"""

from __future__ import annotations

import os
import subprocess
import tempfile
from typing import Dict, Optional, Sequence, Tuple

import numpy as np
import pandas as pd


# ---------------------------------------------------------------------------
# obs / control file writers (BPMF/NLLoc_utils.py:282-639)
# ---------------------------------------------------------------------------

def _fmt_pick_line(station, phase, t: pd.Timestamp, err: float, weight: int):
    return (
        f"{station}\t?\t?\t?\t{phase}\t?\t"
        f"{t.strftime('%Y%m%d')}\t{t.strftime('%H%M')}\t"
        f"{t.strftime('%S.%f')}\tGAU\t{err}\t-1.0\t-1.0\t-1.0\t{weight}\n"
    )


def write_nlloc_obs(
    origin_time,
    picks: pd.DataFrame,
    stations: Sequence[str],
    filename: str,
    path: str = "",
    err_min: float = 0.04,
):
    """Write the NLLoc .obs picks file.

    Stations without a pick get a zero-weight placeholder at the origin time
    (reference behavior, BPMF/NLLoc_utils.py:339-409).
    """
    ot = pd.Timestamp(str(origin_time))
    with open(os.path.join(path, filename), "a") as f:
        for st in stations:
            for ph in ("P", "S"):
                col = f"{ph}_abs_picks"
                has_pick = (
                    col in picks.columns
                    and st in picks.index
                    and not pd.isnull(picks.loc[st, col])
                )
                if has_pick:
                    err_col = f"{ph}_unc_sec"
                    err = (
                        max(err_min, float(picks.loc[st, err_col]))
                        if err_col in picks.columns
                        and not pd.isnull(picks.loc[st, err_col])
                        else err_min
                    )
                    t = pd.Timestamp(picks.loc[st, col])
                    f.write(_fmt_pick_line(st, ph, t, err, 1))
                else:
                    f.write(_fmt_pick_line(st, ph, ot, 0.0, 0))
        f.write(" \n")


def write_nlloc_control(
    ctrl_filename: str,
    out_filename: str,
    obs_filename: str,
    input_path: str,
    output_path: str,
    basename: str,
    trans: str = "GLOBAL",
    method: str = "EDT_OT_WT_ML",
    locsearch: str = "OCT",
    locsearch_params: str = "10 10 10 0.001 100000 10000 0 0",
    phases: Sequence[str] = ("P", "S"),
):
    """Write the NLLoc control file (BPMF/NLLoc_utils.py:412-639)."""
    with open(os.path.join(input_path, ctrl_filename), "w") as f:
        f.write("CONTROL 0 54321\n")
        f.write(f"TRANS {trans}\n")
        f.write(f"LOCSIG seismic_bpmf_tpu\n")
        f.write(f"LOCFILES {os.path.join(input_path, obs_filename)} "
                f"NLLOC_OBS {os.path.join(input_path, basename)} "
                f"{os.path.join(output_path, out_filename)}\n")
        f.write(f"LOCSEARCH {locsearch} {locsearch_params}\n")
        f.write(f"LOCMETH {method} 9999.0 4 -1 -1 -1 -1 -1 1\n")
        f.write("LOCGAU 0.2 0.0\n")
        f.write("LOCGAU2 0.01 0.05 2.0\n")
        f.write("LOCQUAL2ERR 0.1 0.2 0.4 0.8 99999.9\n")
        f.write("LOCPHASEID P P p G Pn Pg\n")
        f.write("LOCPHASEID S S s G Sn Sg\n")
        f.write("LOCHYPOUT SAVE_NLLOC_ALL\n")


def write_nlloc_grids(
    travel_times: Dict[str, Dict[str, np.ndarray]],
    grid_spec: Dict,
    station_coords: pd.DataFrame,
    input_path: str,
    basename: str,
):
    """Write NLLoc-format travel-time grids (.hdr + .buf) per station/phase.

    travel_times : {phase: {station: (n_lon, n_lat, n_dep) seconds}} with the
    BPMF/pykonal axis convention; re-ordered to NLLoc's (x=lon, y=lat, z=dep)
    float32 buffers (BPMF/NLLoc_utils.py:199-279).
    grid_spec : dict with keys origin_lon, origin_lat, origin_dep, d_lon_km,
    d_lat_km, d_dep_km, shape (nx, ny, nz).
    """
    nx, ny, nz = grid_spec["shape"]
    for ph, stations in travel_times.items():
        for sta, tt in stations.items():
            root = os.path.join(
                input_path, f"{basename}.{ph}.{sta}.time"
            )
            tt = np.asarray(tt, np.float32).reshape(nx, ny, nz)
            with open(root + ".buf", "wb") as f:
                tt.astype("<f4").tofile(f)
            with open(root + ".hdr", "w") as f:
                f.write(
                    f"{nx} {ny} {nz}  "
                    f"{grid_spec['origin_lon']} {grid_spec['origin_lat']} "
                    f"{grid_spec['origin_dep']}  "
                    f"{grid_spec['d_lon_km']} {grid_spec['d_lat_km']} "
                    f"{grid_spec['d_dep_km']} TIME\n"
                )
                row = station_coords.loc[sta]
                f.write(
                    f"{sta} {row['longitude']} {row['latitude']} "
                    f"{-row.get('depth_km', 0.0)}\n"
                )
                f.write("TRANSFORM GLOBAL\n")


# ---------------------------------------------------------------------------
# output parsing (BPMF/NLLoc_utils.py:85-196)
# ---------------------------------------------------------------------------

def read_nlloc_outputs(
    filename: str, path: str = ""
) -> Tuple[Optional[Dict], Optional[pd.DataFrame]]:
    """Parse a NLLoc .hyp file.

    Returns (hypocenter dict with origin_time/lat/lon/depth/tt_rms/cov_mat
    (right-handed, BPMF convention) and expectation location, per-station
    predicted travel times + residuals).
    """
    hypocenter: Dict = {}
    success = False
    hypocenter_info = None
    uncertainty_info = None
    tt_rms = np.nan
    with open(os.path.join(path, filename), "r") as f:
        lines = f.readlines()
    it = iter(lines)
    for line in it:
        ls = line.split()
        if not ls:
            continue
        if ls[0] == "NLLOC":
            success = ls[2].strip('"') == "LOCATED"
        elif ls[0] == "GEOGRAPHIC":
            hypocenter_info = ls
        elif ls[0] == "QUALITY":
            tt_rms = float(ls[8])
        elif ls[0] == "STATISTICS":
            uncertainty_info = ls
        elif ls[0] == "STAT_GEOG":
            hypocenter["exp_latitude"] = float(ls[2])
            hypocenter["exp_longitude"] = float(ls[4])
            hypocenter["exp_depth"] = float(ls[6])
            break
    hypocenter["success"] = success
    if hypocenter_info is None:
        return None, None
    sec = float(hypocenter_info[7])
    ts = (
        f"{hypocenter_info[2]}-{hypocenter_info[3]}-{hypocenter_info[4]}"
        f"T{hypocenter_info[5]}:{hypocenter_info[6]}:{max(0.0, sec)}"
    )
    try:
        hypocenter["origin_time"] = pd.Timestamp(ts)
    except Exception:
        return None, None
    if sec < 0.0:
        hypocenter["origin_time"] -= pd.Timedelta(sec, unit="s")
    hypocenter["latitude"] = float(hypocenter_info[9])
    hypocenter["longitude"] = float(hypocenter_info[11])
    hypocenter["depth"] = float(hypocenter_info[13])
    hypocenter["tt_rms"] = tt_rms
    if uncertainty_info is not None:
        cov = np.zeros((3, 3), np.float32)
        cov[0, 0] = float(uncertainty_info[8])
        cov[0, 1] = float(uncertainty_info[10])
        cov[0, 2] = float(uncertainty_info[12])
        cov[1, 1] = float(uncertainty_info[14])
        cov[1, 2] = float(uncertainty_info[16])
        cov[2, 2] = float(uncertainty_info[18])
        # NLLoc covariance is left-handed (z down): flip the z axis
        cov[2, :] *= -1.0
        cov[:, 2] *= -1.0
        hypocenter["cov_mat"] = cov + cov.T - np.diag(cov.diagonal())

    # phase block
    predicted: Dict[str, list] = {
        "stations": [], "P_tt_sec": [], "P_residuals_sec": [],
        "S_tt_sec": [], "S_residuals_sec": [],
    }
    per_sta: Dict[str, Dict] = {}
    in_phase = False
    for line in lines:
        if line.startswith("PHASE "):
            in_phase = True
            continue
        if line.startswith("END_PHASE"):
            break
        if not in_phase:
            continue
        info = line.split()
        if len(info) < 10:
            continue
        sta, ph = info[0], info[4]
        if ph not in ("P", "S"):
            continue
        # predicted travel time and residual are the two fields after the
        # '>' separator (robust to NLLoc version differences in the pick
        # column count; the reference hardcodes indexes 15/16,
        # BPMF/NLLoc_utils.py:176-183)
        if ">" in info:
            sep = info.index(">")
            tt, res = float(info[sep + 1]), float(info[sep + 2])
        else:
            tt, res = float(info[15]), float(info[16])
        per_sta.setdefault(sta, {})[ph] = (tt, res)
    for sta, d in per_sta.items():
        predicted["stations"].append(sta)
        for ph in ("P", "S"):
            tt, res = d.get(ph, (np.nan, np.nan))
            predicted[f"{ph}_tt_sec"].append(tt)
            predicted[f"{ph}_residuals_sec"].append(res)
    df = pd.DataFrame(predicted).set_index("stations")
    return hypocenter, df


# ---------------------------------------------------------------------------
# relocation driver (BPMF/dataset.py:2271-2462)
# ---------------------------------------------------------------------------

def relocate_nlloc(
    event,
    stations: Optional[Sequence[str]] = None,
    input_path: Optional[str] = None,
    output_path: Optional[str] = None,
    basename: str = "bpmf",
    nlloc_bin: str = "NLLoc",
    cleanup: bool = True,
    **control_kwargs,
):
    """Relocate an event with NLLoc: write obs+control, run the binary,
    parse the output, update the event in place.

    On failure the event is returned un-relocated with
    `aux_data['NLLoc_reloc'] = False` (reference resilience behavior,
    BPMF/dataset.py:2388-2421).
    """
    if not hasattr(event, "picks"):
        raise RuntimeError("event has no picks; call pick_PS_phases first")
    stations = list(stations if stations is not None else event.stations)
    tmpdir = None
    if input_path is None:
        tmpdir = tempfile.mkdtemp(prefix="nlloc_")
        input_path = output_path = tmpdir
    obs = f"{event.id}.obs"
    ctrl = f"{event.id}.in"
    out = f"{event.id}"
    obs_path = os.path.join(input_path, obs)
    if os.path.exists(obs_path):
        os.remove(obs_path)
    write_nlloc_obs(event.origin_time, event.picks, stations, obs,
                    path=input_path)
    write_nlloc_control(
        ctrl, out, obs, input_path, output_path, basename, **control_kwargs
    )
    try:
        subprocess.run(
            [nlloc_bin, os.path.join(input_path, ctrl)],
            capture_output=True, timeout=600, check=True,
        )
        import glob as _glob

        hyps = [
            fn for fn in _glob.glob(os.path.join(output_path, f"{out}.*.hyp"))
            if "sum" not in os.path.basename(fn)
        ]
        if not hyps:
            raise FileNotFoundError("no NLLoc .hyp output")
        hypo, predicted = read_nlloc_outputs(os.path.basename(hyps[0]),
                                             output_path)
        if hypo is None or not hypo["success"]:
            raise RuntimeError("NLLoc did not locate")
        event.longitude = hypo["longitude"]
        event.latitude = hypo["latitude"]
        event.depth = hypo["depth"]
        event.origin_time = np.datetime64(hypo["origin_time"].to_datetime64())
        if "cov_mat" in hypo:
            event.cov_mat = hypo["cov_mat"]
            event.set_aux_data({"cov_mat": hypo["cov_mat"]})
        event.set_aux_data(
            {"NLLoc_reloc": True, "tt_rms": hypo["tt_rms"]}
        )
        # absolute predicted arrivals = new origin time + predicted tt
        # (the reference's `{ph}_abs_arrival_times` columns,
        # BPMF/dataset.py:2488-2491)
        ot = pd.Timestamp(str(event.origin_time))
        for ph in ("P", "S"):
            predicted[f"{ph}_abs_arrival_times"] = [
                (ot + pd.Timedelta(seconds=float(tt)))
                if np.isfinite(tt) else pd.NaT
                for tt in predicted[f"{ph}_tt_sec"]
            ]
        event.arrival_times = predicted
        event.hor_ver_uncertainties()
        return event
    except Exception as e:
        event.set_aux_data({"NLLoc_reloc": False})
        return event
    finally:
        if cleanup and tmpdir is not None:
            import shutil

            shutil.rmtree(tmpdir, ignore_errors=True)
