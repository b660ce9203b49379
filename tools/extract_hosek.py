"""Extract the vendored Hosek-Wilkie 2012 skylight coefficient tables and
the CIE 1931 color-matching tables into a single .npz.

Sources (vendored public datasets, same category as the Sobol direction
numbers / Palik IOR constants):
  - /root/reference/src/thirdparty/skylight/ArHosekSkyModelData_Spectral.h
    (3-clause BSD, (c) 2012-2013 Lukas Hosek & Alexander Wilkie) —
    dataset{320..720}[] fitted sky coefficients (2 albedo x 10 turbidity x
    6 elevation control points x 9 coefs per 40 nm band) and
    datasetRad{wl}[] zenith radiances (2 x 10 x 6).
  - /root/reference/src/core/math/Spectral.cpp — the standard CIE 1931
    2-degree observer color matching functions (471 samples, 360-830 nm).

Run once to (re)generate tungsten_tpu/models/primitives/data/hosek.npz.
"""
import os
import re
import sys

import numpy as np

REF = "/root/reference/src"
OUT = os.path.join(
    os.path.dirname(__file__), "..", "tungsten_tpu", "models", "primitives",
    "data", "hosek.npz")

# solar spectrum at the top of the atmosphere used to fit the model
# (ArHosekSkyModel.cpp originalSolarRadianceTable[] — Preetham paper data
# extended into UV), one value per 40 nm band 320..720
ORIGINAL_SOLAR = np.array([
    7500.0, 12500.0, 21127.5, 26760.5, 30663.7, 27825.0, 25503.8, 25134.2,
    23212.1, 21526.7, 19870.8])


def parse_array(text, name):
    m = re.search(re.escape(name) + r"\[\]\s*=?\s*\{(.*?)\}", text, re.S)
    if m is None:
        raise KeyError(name)
    body = re.sub(r"//.*", "", m.group(1))
    vals = [float(v.rstrip("f")) for v in re.findall(
        r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?f?", body)]
    return np.asarray(vals, np.float64)


def main():
    with open(f"{REF}/thirdparty/skylight/ArHosekSkyModelData_Spectral.h") as f:
        spec = f.read()
    wls = list(range(320, 721, 40))
    cfg = np.stack([
        parse_array(spec, f"double dataset{w}").reshape(2, 10, 6, 9)
        for w in wls])  # (11, alb, turb, ctrl, coef)
    rad = np.stack([
        parse_array(spec, f"double datasetRad{w}").reshape(2, 10, 6)
        for w in wls])  # (11, alb, turb, ctrl)

    with open(f"{REF}/core/math/Spectral.cpp") as f:
        cie_src = f.read()
    cie = np.stack([
        parse_array(cie_src, f"const float CIE_{c}_entries")
        for c in "XYZ"]).astype(np.float32)  # (3, 471), 360-830 nm
    assert cie.shape == (3, 471), cie.shape

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(
        OUT, configs=cfg, radiances=rad, cie=cie, solar=ORIGINAL_SOLAR)
    print(f"wrote {OUT}: configs {cfg.shape}, radiances {rad.shape}, "
          f"cie {cie.shape}", file=sys.stderr)


if __name__ == "__main__":
    main()
