"""Extract the Hosek-Wilkie sky model coefficient tables into an .npz.

The Hosek-Wilkie fitted datasets (spectral sky configs, radiances, solar
radiance piecewise polynomials, limb-darkening coefficients) are published
numeric data distributed with the model's BSD reference code; the reference
vendors them as C arrays (src/sunsky/hosek/ArHosekSkyModelData_Spectral.h).
This tool parses those numeric tables (data, not code) into
``cuda_volpath_tpu/models/hosek_data.npz`` so the TPU framework's
from-scratch model implementation can consume them as numpy arrays.

Run once at build time:  python tools/extract_hosek_data.py
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

import numpy as np

SRC = Path("/root/reference/src/sunsky/hosek/ArHosekSkyModelData_Spectral.h")
OUT = Path(__file__).resolve().parent.parent / "cuda_volpath_tpu" / "models" / "hosek_data.npz"

WAVELENGTHS = [320 + 40 * i for i in range(11)]


def parse_arrays(text: str) -> dict:
    """Parse `double name[] = { ... };` blocks into numpy arrays."""
    out = {}
    for m in re.finditer(
            r"double\s+(\w+)\[\]\s*=\s*\{(.*?)\};", text, re.S):
        name, body = m.group(1), m.group(2)
        vals = re.findall(r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?", body)
        out[name] = np.array([float(v) for v in vals], np.float64)
    return out


def main():
    if not SRC.exists():
        sys.exit(f"reference data header not found: {SRC}")
    text = SRC.read_text()
    text = re.sub(r"//[^\n]*", "", text)
    text = re.sub(r"/\*.*?\*/", "", text, flags=re.S)
    arrays = parse_arrays(text)

    # datasets[wl]: 2 albedos x 10 turbidities x 6 elevations x 9 coeffs
    datasets = np.stack([arrays[f"dataset{wl}"].reshape(2, 10, 6, 9)
                         for wl in WAVELENGTHS])
    # datasetsRad[wl]: 2 x 10 x 6
    datasets_rad = np.stack([arrays[f"datasetRad{wl}"].reshape(2, 10, 6)
                             for wl in WAVELENGTHS])
    # solarDatasets[wl]: turbidities(10) x pieces(45) x order(4)
    solar = np.stack([arrays[f"solarDataset{wl}"].reshape(10, 45, 4)
                      for wl in WAVELENGTHS])
    # limbDarkeningDatasets[wl]: 6 coefficients
    limb = np.stack([arrays[f"limbDarkeningDataset{wl}"]
                     for wl in WAVELENGTHS])

    # CIE 1931 2-degree standard observer, 1nm from 360 to 830 nm (public
    # colorimetric data, vendored by the reference in sky_tungsten.cpp:13-374)
    cie_src = SRC.parent.parent / "sky_tungsten.cpp"
    cie_text = re.sub(r"//[^\n]*", "", cie_src.read_text())
    cie = {}
    for m in re.finditer(r"const\s+float\s+(CIE_\w+)\[\]\s*=\s*\{(.*?)\};",
                         cie_text, re.S):
        vals = re.findall(r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?",
                          m.group(2).replace("f", ""))
        cie[m.group(1)] = np.array([float(v) for v in vals], np.float64)
    cie_xyz = np.stack([cie["CIE_X_entries"], cie["CIE_Y_entries"],
                        cie["CIE_Z_entries"]], axis=-1)
    assert cie_xyz.shape == (471, 3), cie_xyz.shape

    np.savez_compressed(OUT,
                        datasets=datasets,
                        datasets_rad=datasets_rad,
                        solar=solar,
                        limb=limb,
                        cie_xyz=cie_xyz,
                        wavelengths=np.array(WAVELENGTHS, np.float64))
    print(f"wrote {OUT} "
          f"({datasets.shape}, {datasets_rad.shape}, {solar.shape}, {limb.shape})")


if __name__ == "__main__":
    main()
