"""Thermal-comfort and solar kernels, backend-generic.

Ports of the *published formulas* behind the reference's UDF surface
(SURVEY.md §2.10; reference call sites ``main.py:115-205``). No code is
taken from the reference or its vendored fork — each kernel cites its
public literature source. Every kernel is pure element-wise arithmetic
written against ``exprbackend``, so the engine gets three consistent
renderings: numpy (pandas-UDF / golden tests), Spark Column (production,
whole-stage codegen), SQL text (DuckDB oracle).

Kernel inventory (reference parity):

* UDF-1 ``cos_solar_zenith_angle``  — solar geometry (Spencer 1971 Fourier
  series for declination and equation of time); reference uses thermofeel's
  hour-integrated variant (``main.py:115-131``); we evaluate at the
  mid-hour point, a documented deviation (≤0.3% of the hour integral).
* UDF-2 ``erbs`` — Erbs/Klein/Duffie (1982) diffuse-fraction decomposition
  (ghi, cos zenith, day-of-year → dni, dhi); reference via pvlib
  (``utils.py:57-60``, ``main.py:135-144``).
* UDF-3 ``mean_radiant_temperature`` — Di Napoli, Hogan & Pappenberger
  (2020), the 6-flux MRT formula used by thermofeel (``main.py:149-158``).
* UDF-4 ``utci`` — UTCI 6th-order polynomial approximation, Bröde et al.
  (2012); public-domain Fortran listing from utci.org (``UTCI_approx``);
  humidity from dewpoint via Hardy (1998) ITS-90 saturation vapour
  pressure, as in the reference (``main.py:188-195`` with ehPa=None).
* UDF-5 ``wbgt`` — ISO-7243-style outdoor weighting
  0.7·Tnwb + 0.2·Tg + 0.1·Ta with Stull (2011) wet-bulb and a globe
  temperature recovered from MRT by two Newton steps on the standard
  15 cm globe energy balance (documented approximation; the reference's
  thermofeel call is ``main.py:197-203``).
* SF-2 ``wind_speed`` — √(u²+v²). The reference computes
  ``np.hypot(ugrd10m, ugrd10m)`` — u twice, a preserved-and-documented
  upstream bug (``main.py:179``); this engine computes the correct
  magnitude (SURVEY.md §2.8 SF-2).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# UTCI polynomial coefficients — Bröde et al. 2012 (utci.org UTCI_approx,
# public domain). Term (i, j, k, l, c): c · Ta^i · va^j · D_Tmrt^k · Pa^l
# with Ta air temp [°C], va wind [m/s], D_Tmrt = Tmrt−Ta [K], Pa vapour
# pressure [kPa]. UTCI = Ta + Σ terms.
# ---------------------------------------------------------------------------
UTCI_COEFFS: list[tuple[int, int, int, int, float]] = [
    (0, 0, 0, 0, 6.07562052e-01),
    (1, 0, 0, 0, -2.27712343e-02),
    (2, 0, 0, 0, 8.06470249e-04),
    (3, 0, 0, 0, -1.54271372e-04),
    (4, 0, 0, 0, -3.24651735e-06),
    (5, 0, 0, 0, 7.32602852e-08),
    (6, 0, 0, 0, 1.35959073e-09),
    (0, 1, 0, 0, -2.25836520e00),
    (1, 1, 0, 0, 8.80326035e-02),
    (2, 1, 0, 0, 2.16844454e-03),
    (3, 1, 0, 0, -1.53347087e-05),
    (4, 1, 0, 0, -5.72983704e-07),
    (5, 1, 0, 0, -2.55090145e-09),
    (0, 2, 0, 0, -7.51269505e-01),
    (1, 2, 0, 0, -4.08350271e-03),
    (2, 2, 0, 0, -5.21670675e-05),
    (3, 2, 0, 0, 1.94544667e-06),
    (4, 2, 0, 0, 1.14099531e-08),
    (0, 3, 0, 0, 1.58137256e-01),
    (1, 3, 0, 0, -6.57263143e-05),
    (2, 3, 0, 0, 2.22697524e-07),
    (3, 3, 0, 0, -4.16117031e-08),
    (0, 4, 0, 0, -1.27762753e-02),
    (1, 4, 0, 0, 9.66891875e-06),
    (2, 4, 0, 0, 2.52785852e-09),
    (0, 5, 0, 0, 4.56306672e-04),
    (1, 5, 0, 0, -1.74202546e-07),
    (0, 6, 0, 0, -5.91491269e-06),
    (0, 0, 1, 0, 3.98374029e-01),
    (1, 0, 1, 0, 1.83945314e-04),
    (2, 0, 1, 0, -1.73754510e-04),
    (3, 0, 1, 0, -7.60781159e-07),
    (4, 0, 1, 0, 3.77830287e-08),
    (5, 0, 1, 0, 5.43079673e-10),
    (0, 1, 1, 0, -2.00518269e-02),
    (1, 1, 1, 0, 8.92859837e-04),
    (2, 1, 1, 0, 3.45433048e-06),
    (3, 1, 1, 0, -3.77925774e-07),
    (4, 1, 1, 0, -1.69699377e-09),
    (0, 2, 1, 0, 1.69992415e-04),
    (1, 2, 1, 0, -4.99204314e-05),
    (2, 2, 1, 0, 2.47417178e-07),
    (3, 2, 1, 0, 1.07596466e-08),
    (0, 3, 1, 0, 8.49242932e-05),
    (1, 3, 1, 0, 1.35191328e-06),
    (2, 3, 1, 0, -6.21531254e-09),
    (0, 4, 1, 0, -4.99410301e-06),
    (1, 4, 1, 0, -1.89489258e-08),
    (0, 5, 1, 0, 8.15300114e-08),
    (0, 0, 2, 0, 7.55043090e-04),
    (1, 0, 2, 0, -5.65095215e-05),
    (2, 0, 2, 0, -4.52166564e-07),
    (3, 0, 2, 0, 2.46688878e-08),
    (4, 0, 2, 0, 2.42674348e-10),
    (0, 1, 2, 0, 1.54547250e-04),
    (1, 1, 2, 0, 5.24110970e-06),
    (2, 1, 2, 0, -8.75874982e-08),
    (3, 1, 2, 0, -1.50743064e-09),
    (0, 2, 2, 0, -1.56236307e-05),
    (1, 2, 2, 0, -1.33895614e-07),
    (2, 2, 2, 0, 2.49709824e-09),
    (0, 3, 2, 0, 6.51711721e-07),
    (1, 3, 2, 0, 1.94960053e-09),
    (0, 4, 2, 0, -1.00361113e-08),
    (0, 0, 3, 0, -1.21206673e-05),
    (1, 0, 3, 0, -2.18203660e-07),
    (2, 0, 3, 0, 7.51269482e-09),
    (3, 0, 3, 0, 9.79063848e-11),
    (0, 1, 3, 0, 1.25006734e-06),
    (1, 1, 3, 0, -1.81584736e-09),
    (2, 1, 3, 0, -3.52197671e-10),
    (0, 2, 3, 0, -3.36514630e-08),
    (1, 2, 3, 0, 1.35908359e-10),
    (0, 3, 3, 0, 4.17032620e-10),
    (0, 0, 4, 0, -1.30369025e-09),
    (1, 0, 4, 0, 4.13908461e-10),
    (2, 0, 4, 0, 9.22652254e-12),
    (0, 1, 4, 0, -5.08220384e-09),
    (1, 1, 4, 0, -2.24730961e-11),
    (0, 2, 4, 0, 1.17139133e-10),
    (0, 0, 5, 0, 6.62154879e-10),
    (1, 0, 5, 0, 4.03863260e-13),
    (0, 1, 5, 0, 1.95087203e-12),
    (0, 0, 6, 0, -4.73602469e-12),
    (0, 0, 0, 1, 5.12733497e00),
    (1, 0, 0, 1, -3.12788561e-01),
    (2, 0, 0, 1, -1.96701861e-02),
    (3, 0, 0, 1, 9.99690870e-04),
    (4, 0, 0, 1, 9.51738512e-06),
    (5, 0, 0, 1, -4.66426341e-07),
    (0, 1, 0, 1, 5.48050612e-01),
    (1, 1, 0, 1, -3.30552823e-03),
    (2, 1, 0, 1, -1.64119440e-03),
    (3, 1, 0, 1, -5.16670694e-06),
    (4, 1, 0, 1, 9.52692432e-07),
    (0, 2, 0, 1, -4.29223622e-02),
    (1, 2, 0, 1, 5.00845667e-03),
    (2, 2, 0, 1, 1.00601257e-06),
    (3, 2, 0, 1, -1.81748644e-06),
    (0, 3, 0, 1, -1.25813502e-03),
    (1, 3, 0, 1, -1.79330391e-04),
    (2, 3, 0, 1, 2.34994441e-06),
    (0, 4, 0, 1, 1.29735808e-04),
    (1, 4, 0, 1, 1.29064870e-06),
    (0, 5, 0, 1, -2.28558686e-06),
    (0, 0, 1, 1, -3.69476348e-02),
    (1, 0, 1, 1, 1.62325322e-03),
    (2, 0, 1, 1, -3.14279680e-05),
    (3, 0, 1, 1, 2.59835559e-06),
    (4, 0, 1, 1, -4.77136523e-08),
    (0, 1, 1, 1, 8.64203390e-03),
    (1, 1, 1, 1, -6.87405181e-04),
    (2, 1, 1, 1, -9.13863872e-06),
    (3, 1, 1, 1, 5.15916806e-07),
    (0, 2, 1, 1, -3.59217476e-05),
    (1, 2, 1, 1, 3.28696511e-05),
    (2, 2, 1, 1, -7.10542454e-07),
    (0, 3, 1, 1, -1.24382300e-05),
    (1, 3, 1, 1, -7.38584400e-09),
    (0, 4, 1, 1, 2.20609296e-07),
    (0, 0, 2, 1, -7.32469180e-04),
    (1, 0, 2, 1, -1.87381964e-05),
    (2, 0, 2, 1, 4.80925239e-06),
    (3, 0, 2, 1, -8.75492040e-08),
    (0, 1, 2, 1, 2.77862930e-05),
    (1, 1, 2, 1, -5.06004592e-06),
    (2, 1, 2, 1, 1.14325367e-07),
    (0, 2, 2, 1, 2.53016723e-06),
    (1, 2, 2, 1, -1.72857035e-08),
    (0, 3, 2, 1, -3.95079398e-08),
    (0, 0, 3, 1, -3.59413173e-07),
    (1, 0, 3, 1, 7.04388046e-07),
    (2, 0, 3, 1, -1.89309167e-08),
    (0, 1, 3, 1, -4.79768731e-07),
    (1, 1, 3, 1, 7.96079978e-09),
    (0, 2, 3, 1, 1.62897058e-09),
    (0, 0, 4, 1, 3.94367674e-08),
    (1, 0, 4, 1, -1.18566247e-09),
    (0, 1, 4, 1, 3.34678041e-10),
    (0, 0, 5, 1, -1.15606447e-10),
    (0, 0, 0, 2, -2.80626406e00),
    (1, 0, 0, 2, 5.48712484e-01),
    (2, 0, 0, 2, -3.99428410e-03),
    (3, 0, 0, 2, -9.54009191e-04),
    (4, 0, 0, 2, 1.93090978e-05),
    (0, 1, 0, 2, -3.08806365e-01),
    (1, 1, 0, 2, 1.16952364e-02),
    (2, 1, 0, 2, 4.95271903e-04),
    (3, 1, 0, 2, -1.90710882e-05),
    (0, 2, 0, 2, 2.10787756e-03),
    (1, 2, 0, 2, -6.98445738e-04),
    (2, 2, 0, 2, 2.30109073e-05),
    (0, 3, 0, 2, 4.17856590e-04),
    (1, 3, 0, 2, -1.27043871e-05),
    (0, 4, 0, 2, -3.04620472e-06),
    (0, 0, 1, 2, 5.14507424e-02),
    (1, 0, 1, 2, -4.32510997e-03),
    (2, 0, 1, 2, 8.99281156e-05),
    (3, 0, 1, 2, -7.14663943e-07),
    (0, 1, 1, 2, -2.66016305e-04),
    (1, 1, 1, 2, 2.63789586e-04),
    (2, 1, 1, 2, -7.01199003e-06),
    (0, 2, 1, 2, -1.06823306e-04),
    (1, 2, 1, 2, 3.61341136e-06),
    (0, 3, 1, 2, 2.29748967e-07),
    (0, 0, 2, 2, 3.04788893e-04),
    (1, 0, 2, 2, -6.42070836e-05),
    (2, 0, 2, 2, 1.16257971e-06),
    (0, 1, 2, 2, 7.68023384e-06),
    (1, 1, 2, 2, -5.47446896e-07),
    (0, 2, 2, 2, -3.59937910e-08),
    (0, 0, 3, 2, -4.36497725e-06),
    (1, 0, 3, 2, 1.68737969e-07),
    (0, 1, 3, 2, 2.67489271e-08),
    (0, 0, 4, 2, 3.23926897e-09),
    (0, 0, 0, 3, -3.53874123e-02),
    (1, 0, 0, 3, -2.21201190e-01),
    (2, 0, 0, 3, 1.55126038e-02),
    (3, 0, 0, 3, -2.63917279e-04),
    (0, 1, 0, 3, 4.53433455e-02),
    (1, 1, 0, 3, -4.32943862e-03),
    (2, 1, 0, 3, 1.45389826e-04),
    (0, 2, 0, 3, 2.17508610e-04),
    (1, 2, 0, 3, -6.66724702e-05),
    (0, 3, 0, 3, 3.33217140e-05),
    (0, 0, 1, 3, -2.26921615e-03),
    (1, 0, 1, 3, 3.80261982e-04),
    (2, 0, 1, 3, -5.45314314e-09),
    (0, 1, 1, 3, -7.96355448e-04),
    (1, 1, 1, 3, 2.53458034e-05),
    (0, 2, 1, 3, -6.31223658e-06),
    (0, 0, 2, 3, 3.02122035e-04),
    (1, 0, 2, 3, -4.77403547e-06),
    (0, 1, 2, 3, 1.73825715e-06),
    (0, 0, 3, 3, -4.09087898e-07),
    (0, 0, 0, 4, 6.14155345e-01),
    (1, 0, 0, 4, -6.16755931e-02),
    (2, 0, 0, 4, 1.33374846e-03),
    (0, 1, 0, 4, 3.55375387e-03),
    (1, 1, 0, 4, -5.13027851e-04),
    (0, 2, 0, 4, 1.02449757e-04),
    (0, 0, 1, 4, -1.48526421e-03),
    (1, 0, 1, 4, -4.11469183e-05),
    (0, 1, 1, 4, -6.80434415e-06),
    (0, 0, 2, 4, -9.77675906e-06),
    (0, 0, 0, 5, 8.82773108e-02),
    (1, 0, 0, 5, -3.01859306e-03),
    (0, 1, 0, 5, 1.04452989e-03),
    (0, 0, 1, 5, 2.47090539e-04),
    (0, 0, 0, 6, 1.48348065e-03),
]

# Hardy (1998) ITS-90 saturation-vapour-pressure-over-water coefficients
# (as used by thermofeel/ECMWF; public formula):
# ln es[Pa] = g0/T² + g1/T + g2 + g3·T + g4·T² + g5·T³ + g6·T⁴ + g7·ln T
_HARDY_G = (
    -2.8365744e3,
    -6.028076559e3,
    1.954263612e1,
    -2.737830188e-2,
    1.6261698e-5,
    7.0229056e-10,
    -1.8680009e-13,
    2.7150305,
)

STEFAN_BOLTZMANN = 5.67e-8


def tree_sum(terms: list):
    """Balanced pairwise sum of expression terms.

    Used (identically) by every backend so the floating-point addition
    order — and therefore the bit-exact result — is the same in numpy,
    Spark codegen, and the DuckDB oracle. Also keeps the SQL/Catalyst
    expression depth at O(log n) instead of O(n): a 210-term left-deep
    chain exceeds DuckDB's binder recursion limit (128).
    """
    assert terms
    while len(terms) > 1:
        nxt = [terms[i] + terms[i + 1] for i in range(0, len(terms) - 1, 2)]
        if len(terms) % 2:
            nxt.append(terms[-1])
        terms = nxt
    return terms[0]


# ---------------------------------------------------------------------------
# Kernels (generic over backend B; inputs are backend-native scalars/arrays/
# columns/SqlExprs).
# ---------------------------------------------------------------------------


def saturation_vapour_pressure_hpa(B, t_k):
    """Hardy (1998) ITS-90 es over water, hPa, from temperature in K."""
    g = _HARDY_G
    ln_es = (
        g[0] / (t_k * t_k)
        + g[1] / t_k
        + g[2]
        + g[3] * t_k
        + g[4] * t_k * t_k
        + g[5] * t_k * t_k * t_k
        + g[6] * t_k * t_k * t_k * t_k
        + g[7] * B.log(t_k)
    )
    return B.exp(ln_es) * 0.01  # Pa → hPa


def cos_solar_zenith_angle(B, lat_deg, lon_deg, doy, utc_hour):
    """Cosine of solar zenith angle, clamped to ≥ 0.

    Spencer (1971) Fourier-series declination + equation of time; hour
    angle from local solar time. Evaluated at the given instant; callers
    wanting the reference's hour-integral evaluate at mid-hour
    (``utc_hour − 0.5``), see ``main.py:115-131`` parity note.
    """
    two_pi = 2.0 * np.pi
    gamma = B.let("gamma", two_pi / 365.0 * (doy - 1.0 + (utc_hour - 12.0) / 24.0))
    decl = (
        0.006918
        - 0.399912 * B.cos(gamma)
        + 0.070257 * B.sin(gamma)
        - 0.006758 * B.cos(2.0 * gamma)
        + 0.000907 * B.sin(2.0 * gamma)
        - 0.002697 * B.cos(3.0 * gamma)
        + 0.00148 * B.sin(3.0 * gamma)
    )
    decl = B.let("decl", decl)
    eot_min = 229.18 * (
        0.000075
        + 0.001868 * B.cos(gamma)
        - 0.032077 * B.sin(gamma)
        - 0.014615 * B.cos(2.0 * gamma)
        - 0.040849 * B.sin(2.0 * gamma)
    )
    solar_time_h = utc_hour + lon_deg / 15.0 + eot_min / 60.0
    hour_angle = B.let("hour_angle", B.radians(15.0 * (solar_time_h - 12.0)))
    lat_r = B.let("lat_r", B.radians(lat_deg))
    cossza = B.sin(lat_r) * B.sin(decl) + B.cos(lat_r) * B.cos(decl) * B.cos(hour_angle)
    return B.greatest(cossza, B.lit(0.0))


def erbs_diffuse_fraction(B, kt):
    """Erbs, Klein & Duffie (1982) diffuse fraction DF(kt), piecewise."""
    kt = B.let("kt", kt)
    poly = (
        0.9511
        - 0.1604 * kt
        + 4.388 * kt * kt
        - 16.638 * kt * kt * kt
        + 12.336 * kt * kt * kt * kt
    )
    return B.where(kt <= 0.22, 1.0 - 0.09 * kt, B.where(kt <= 0.8, poly, B.lit(0.165)))


def erbs(B, ghi, cossza, doy):
    """GHI → (dni, dhi) via Erbs decomposition (pvlib-equivalent public
    formula; reference ``utils.py:57-60``, ``main.py:135-144``).

    Returns a dict with keys ``dni``, ``dhi``. Night (cossza ≤ 0.01) → 0.
    """
    # extraterrestrial radiation with eccentricity correction (Spencer 1971)
    b_ang = B.let("b_ang", 2.0 * np.pi * doy / 365.0)
    ea = 1367.0 * (
        1.00011
        + 0.034221 * B.cos(b_ang)
        + 0.00128 * B.sin(b_ang)
        + 0.000719 * B.cos(2.0 * b_ang)
        + 0.000077 * B.sin(2.0 * b_ang)
    )
    cossza = B.let("erbs_cz", cossza)
    ghi = B.let("erbs_ghi", ghi)
    day = cossza > 0.01
    safe_cos = B.let("safe_cos", B.greatest(cossza, B.lit(0.01)))
    kt = B.greatest(ghi / (ea * safe_cos), B.lit(0.0))
    df = B.let("erbs_df", erbs_diffuse_fraction(B, kt))
    dhi = B.let("erbs_dhi", df * ghi)
    dni = B.let("erbs_dni", (ghi - dhi) / safe_cos)
    zero = B.lit(0.0)
    return {
        "dni": B.where(day, B.greatest(dni, zero), zero),
        "dhi": B.where(day, B.greatest(dhi, zero), zero),
    }


def mean_radiant_temperature_k(B, ssrd, ssru, strd, stru, dni, cossza):
    """6-flux MRT [K] — Di Napoli, Hogan & Pappenberger (2020) formula used
    by thermofeel (reference assembly at ``main.py:149-158``).

    ssrd/ssru: downward/upward shortwave at surface [W/m²];
    strd/stru: downward/upward longwave; dni: direct normal irradiance;
    cossza: cosine of solar zenith (≥0).
    """
    cossza = B.let("mrt_cz", cossza)
    dni = B.let("mrt_dni", dni)
    dsw = ssrd - dni * cossza  # diffuse shortwave down
    dsw = B.let("mrt_dsw", B.greatest(dsw, B.lit(0.0)))
    # projected-area factor for a standing person, gamma = solar elevation°
    gamma = B.let("mrt_gamma", B.degrees(B.asin(B.least(cossza, B.lit(1.0)))))
    fp = 0.308 * B.cos(B.radians(gamma * (0.998 - gamma * gamma / 50000.0)))
    fa = 0.5  # angle factors for diffuse/longwave on a rotationally symmetric person
    absorb = 0.7 / 0.97  # shortwave absorption / longwave emissivity
    flux = (
        fa * strd
        + fa * stru
        + absorb * (fa * dsw + fa * ssru + fp * dni)
    )
    return B.power(flux / STEFAN_BOLTZMANN, 0.25)


def utci_c(B, t2_k, va_ms, mrt_k, td_k):
    """UTCI [°C] — Bröde et al. (2012) 6th-order polynomial approximation
    (public-domain ``UTCI_approx``), humidity from dewpoint via Hardy es.

    Valid range (clamped upstream by data, not here): Ta ∈ [−50, 50] °C,
    va ∈ [0.5, 17] m/s, D_Tmrt ∈ [−30, 70] K.
    """
    ta = B.let("ta", t2_k - 273.15)
    dtm = B.let("dtm", mrt_k - t2_k)
    e_hpa = saturation_vapour_pressure_hpa(B, B.let("utci_td", td_k))
    pa = B.let("pa", e_hpa / 10.0)  # kPa
    va = B.let("va_c", B.least(B.greatest(va_ms, B.lit(0.5)), B.lit(17.0)))

    # power ladders as bound intermediates (reuse products instead of
    # POWER() so all three backends produce the identical multiply tree,
    # and each power is computed once instead of per term)
    def ladder(tag, x):
        p = [None, x]
        for k in range(5):
            p.append(B.let(f"{tag}{k + 2}", p[-1] * x))
        return p  # p[1]..p[6]

    pt, pv, pd, pp = (
        ladder("ta", ta),
        ladder("va", va),
        ladder("dtm", dtm),
        ladder("pa", pa),
    )

    terms = []
    for i, j, k, l, c in UTCI_COEFFS:
        term = B.lit(c)
        if i:
            term = term * pt[i]
        if j:
            term = term * pv[j]
        if k:
            term = term * pd[k]
        if l:
            term = term * pp[l]
        terms.append(term)
    return ta + tree_sum(terms)


def wet_bulb_stull_c(B, ta_c, rh_pct):
    """Stull (2011) psychrometric wet-bulb temperature [°C] from air
    temperature [°C] and relative humidity [%]."""
    return (
        ta_c * B.atan(0.151977 * B.sqrt(rh_pct + 8.313659))
        + B.atan(ta_c + rh_pct)
        - B.atan(rh_pct - 1.676331)
        + 0.00391838 * B.power(rh_pct, 1.5) * B.atan(0.023101 * rh_pct)
        - 4.686035
    )


def globe_temperature_k(B, ta_k, mrt_k, va_ms):
    """Globe temperature [K] from MRT: two Newton steps on the standard
    15 cm globe energy balance  Tg⁴ + h·(Tg − Ta) = Tmrt⁴  with
    h = 1.1e8·va^0.6 / (0.95·0.15^0.4)  (ISO 7726 globe constants).

    Each Newton iterate is let-bound: unbound, the symbolic tree grows
    ~36× per step (tg appears six times in its own update)."""
    va = B.greatest(va_ms, B.lit(0.1))
    h = B.let("bg_h", 1.1e8 * B.power(va, 0.6) / (0.95 * 0.15**0.4))
    mrt_k = B.let("bg_mrt", mrt_k)
    ta_k = B.let("bg_ta", ta_k)
    mrt4 = B.let("bg_mrt4", mrt_k * mrt_k * mrt_k * mrt_k)
    tg = mrt_k  # initial guess

    for i in range(2):
        tg2 = B.let(f"bg_tg2_{i}", tg * tg)
        f = tg2 * tg2 + h * (tg - ta_k) - mrt4
        fp = 4.0 * tg2 * tg + h
        tg = B.let(f"bg_tg_{i + 1}", tg - f / fp)
    return tg


def wbgt_c(B, t2_k, mrt_k, va_ms, td_k):
    """Outdoor WBGT [°C]: 0.7·Tnwb + 0.2·Tg + 0.1·Ta (ISO 7243 weighting)
    with Stull wet-bulb and Newton-recovered globe temperature.

    Documented approximation of the reference's thermofeel call
    (``main.py:197-203``) — same inputs, same output semantics.
    """
    t2_k = B.let("wbgt_t2", t2_k)
    ta_c = B.let("wbgt_ta", t2_k - 273.15)
    rh = 100.0 * saturation_vapour_pressure_hpa(B, B.let("wbgt_td", td_k)) / saturation_vapour_pressure_hpa(B, t2_k)
    rh = B.let("wbgt_rh", B.least(B.greatest(rh, B.lit(1.0)), B.lit(100.0)))
    tnwb = wet_bulb_stull_c(B, ta_c, rh)
    tg_c = globe_temperature_k(B, t2_k, mrt_k, va_ms) - 273.15
    return 0.7 * tnwb + 0.2 * tg_c + 0.1 * ta_c


def wind_speed(B, u, v):
    """10 m wind speed √(u²+v²). Correct form — the reference's
    ``np.hypot(u, u)`` (``main.py:179``) is a documented upstream bug."""
    return B.hypot(u, v)


# ---------------------------------------------------------------------------
# Serving-payload encode / decode — SF-9 (reference ``main.py:254-276``):
# (utci, wbgt, hour-offset) → int32:
#   round((utci+100)·10)·2000 + round((wbgt+100)·10), then ·200 + offset.
# Max encoded value 799_999_999 < 2³¹−1.
# ---------------------------------------------------------------------------


def encode_temp_times(B, utci, wbgt, offset_hours):
    """Bit-pack (utci °C, wbgt °C, offset h) into one int-valued double.
    Callers cast to int; round-not-truncate per ``main.py:266-270``."""
    u = B.floor((utci + 100.0) * 10.0 + 0.5)  # round-half-up, backend-identical
    w = B.floor((wbgt + 100.0) * 10.0 + 0.5)
    return (u * 2000.0 + w) * 200.0 + offset_hours


def decode_utci(B, encoded):
    return B.floor(encoded / 400000.0) / 10.0 - 100.0


def decode_wbgt_c(B, encoded):
    return (B.floor(encoded / 200.0) - B.floor(encoded / 400000.0) * 2000.0) / 10.0 - 100.0


def decode_offset_hours(B, encoded):
    return encoded - B.floor(encoded / 200.0) * 200.0
