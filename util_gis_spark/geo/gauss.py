"""Gauss-Krüger (6-degree zone transverse Mercator) projection, pure numpy.

Matches the reference's CRS construction (GisUtil G:782-886): WGS84
ellipsoid (a=6378137, 1/f=298.257223563), scale factor 1.0, false
northing 0, per-zone false easting = zone*1e6 + 5e5, central meridian
= (zone-1)*6 - 180 + 3, zone = floor((lon+180)/6)+1 (G:11592-11602,
G:12420-12442). The inverse infers the zone from the X coordinate's
millions digit (G:11977-12009).

Implementation is the 6th-order Krüger series (public-domain formulas,
cf. Karney 2011 "Transverse Mercator with an accuracy of a few
nanometers"), fully vectorized — this is the kernel inside the
engine's Arrow projection UDF, replacing the reference's GeoTools
MathTransform + ConcurrentHashMap cache (G:253-283): numpy amortizes
what the reference caches.
"""

from __future__ import annotations

import numpy as np

A_WGS84 = 6378137.0
F_WGS84 = 1.0 / 298.257223563
_E = np.sqrt(F_WGS84 * (2 - F_WGS84))  # first eccentricity
_N = F_WGS84 / (2.0 - F_WGS84)  # third flattening n
_A_BAR = A_WGS84 / (1 + _N) * (1 + _N**2 / 4 + _N**4 / 64 + _N**6 / 256)

_n = _N
_ALPHA = np.array(
    [
        _n / 2 - 2 * _n**2 / 3 + 5 * _n**3 / 16 + 41 * _n**4 / 180 - 127 * _n**5 / 288 + 7891 * _n**6 / 37800,
        13 * _n**2 / 48 - 3 * _n**3 / 5 + 557 * _n**4 / 1440 + 281 * _n**5 / 630 - 1983433 * _n**6 / 1935360,
        61 * _n**3 / 240 - 103 * _n**4 / 140 + 15061 * _n**5 / 26880 + 167603 * _n**6 / 181440,
        49561 * _n**4 / 161280 - 179 * _n**5 / 168 + 6601661 * _n**6 / 7257600,
        34729 * _n**5 / 80640 - 3418889 * _n**6 / 1995840,
        212378941 * _n**6 / 319334400,
    ]
)
_BETA = np.array(
    [
        _n / 2 - 2 * _n**2 / 3 + 37 * _n**3 / 96 - _n**4 / 360 - 81 * _n**5 / 512 + 96199 * _n**6 / 604800,
        _n**2 / 48 + _n**3 / 15 - 437 * _n**4 / 1440 + 46 * _n**5 / 105 - 1118711 * _n**6 / 3870720,
        17 * _n**3 / 480 - 37 * _n**4 / 840 - 209 * _n**5 / 4480 + 5569 * _n**6 / 90720,
        4397 * _n**4 / 161280 - 11 * _n**5 / 504 - 830251 * _n**6 / 7257600,
        4583 * _n**5 / 161280 - 108847 * _n**6 / 3991680,
        20648693 * _n**6 / 638668800,
    ]
)
_J = np.arange(1, 7, dtype=np.float64)


def zone_from_lon(lon) -> np.ndarray:
    """zone = floor((lon+180)/6)+1, clamped to [1,60] (G:11592).
    NaN input is the CALLER's to filter: floor(NaN) cast to int64 is
    undefined (in practice INT64_MIN, which the clip turns into zone 1
    — silently wrong, not an error). project_trajectories computes its
    unified-zone extent over finite lons only for exactly this
    reason."""
    z = np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / 6.0).astype(np.int64) + 1
    return np.clip(z, 1, 60)


def central_meridian(zone) -> np.ndarray:
    return (np.asarray(zone, dtype=np.float64) - 1) * 6.0 - 180.0 + 3.0


def false_easting(zone) -> np.ndarray:
    return np.asarray(zone, dtype=np.float64) * 1e6 + 5e5


def zone_from_x(x) -> np.ndarray:
    """Zone from the X coordinate's millions digit (G:11977-12009).

    VALIDITY: the millions digit identifies the zone only while
    |x - false_easting| < 5e5, i.e. the point lies within ~4.5 deg of
    the zone's central meridian — true for per-point zone projections,
    NOT guaranteed for UNIFIED-zone batches (a trajectory projected in
    the batch center's zone can put far-edge points past the headroom,
    and inference then lands one zone over, skewing longitudes by up
    to ~6 deg on inversion). Callers holding unified-zone coordinates
    must pass zone= to gauss_inverse explicitly (every in-repo caller
    does; r5 review)."""
    z = np.floor(np.asarray(x, dtype=np.float64) / 1e6).astype(np.int64)
    return np.clip(z, 1, 60)


_SPHI_MAX = 1.0 - 1e-15  # pole clamp, shared with the SQL twin


def gauss_forward(lon, lat, zone=None):
    """WGS84 (deg) -> Gauss-Krüger (x east, y north, meters).

    If `zone` is None each point uses its own longitude's zone; pass a
    scalar zone to project a whole batch in one unified zone — the
    reference projects whole trajectories in the zone of the batch
    center (G:12411-12431).
    Returns (x, y, zone) arrays.
    """
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    z = zone_from_lon(lon) if zone is None else np.broadcast_to(np.asarray(zone, dtype=np.int64), lon.shape)
    lon0 = central_meridian(z)
    fe = false_easting(z)

    phi = np.radians(lat)
    dlam = np.radians(lon - lon0)

    # clamp |sin(phi)| below 1 so the exact poles stay finite: at
    # sphi = +-1 arctanh diverges — numpy rode the inf through to the
    # correct pole northing but the SQL twin's ln((1+s)/(1-s)) hit
    # DuckDB's 2.0/0.0 = NULL and silently nulled x/y (r5 review).
    # Identical clamp in both kernels; it only bites within ~6e-8 deg
    # of a pole and moves the result sub-micron.
    sphi = np.clip(np.sin(phi), -_SPHI_MAX, _SPHI_MAX)
    t = np.sinh(np.arctanh(sphi) - _E * np.arctanh(_E * sphi))
    xi_p = np.arctan2(t, np.cos(dlam))
    eta_p = np.arcsinh(np.sin(dlam) / np.hypot(t, np.cos(dlam)))

    j2xi = 2.0 * np.multiply.outer(_J, xi_p)  # (6, ...) broadcast
    j2eta = 2.0 * np.multiply.outer(_J, eta_p)
    alpha = _ALPHA.reshape((6,) + (1,) * xi_p.ndim)
    xi = xi_p + np.sum(alpha * np.sin(j2xi) * np.cosh(j2eta), axis=0)
    eta = eta_p + np.sum(alpha * np.cos(j2xi) * np.sinh(j2eta), axis=0)

    x = _A_BAR * eta + fe
    y = _A_BAR * xi
    return x, y, z


def gauss_inverse(x, y, zone=None):
    """Gauss-Krüger (m) -> WGS84 (deg). Zone inferred from X if None."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = zone_from_x(x) if zone is None else np.broadcast_to(np.asarray(zone, dtype=np.int64), x.shape)
    lon0 = central_meridian(z)
    fe = false_easting(z)

    xi = y / _A_BAR
    eta = (x - fe) / _A_BAR

    j2xi = 2.0 * np.multiply.outer(_J, xi)
    j2eta = 2.0 * np.multiply.outer(_J, eta)
    beta = _BETA.reshape((6,) + (1,) * xi.ndim)
    xi_p = xi - np.sum(beta * np.sin(j2xi) * np.cosh(j2eta), axis=0)
    eta_p = eta - np.sum(beta * np.cos(j2xi) * np.sinh(j2eta), axis=0)

    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))  # conformal latitude
    # invert conformal latitude by fixed-point iteration (converges fast)
    phi = chi.copy()
    for _ in range(8):
        sphi = np.sin(phi)
        phi = 2.0 * np.arctan(
            np.tan(chi / 2 + np.pi / 4) * ((1 + _E * sphi) / (1 - _E * sphi)) ** (_E / 2)
        ) - np.pi / 2

    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return lon0 + np.degrees(lam), np.degrees(phi), z


def gauss_forward_sql(src: str, lon: str = "lon", lat: str = "lat", zone: str = "zone") -> str:
    """ANSI-SQL twin of gauss_forward for the DuckDB oracle: the same
    6th-order Krüger series, with the hyperbolics spelled as exp/ln
    (atanh(u) = ln((1+u)/(1-u))/2, sinh/cosh = (e^v -/+ e^-v)/2,
    asinh(u) = ln(u + sqrt(u^2+1))). `src` must provide lon/lat/zone
    and must NOT already carry columns named x, y, or any `_g_*` name:
    SELECT-list duplicates dedup to x_1/... in DuckDB, so a stale src
    x would silently survive as the output `x` (r6 review — the
    intermediates now carry a `_g_` prefix so ordinary src columns
    like t/u/xi can no longer collide). The result appends x, y
    (Gauss meters). Agreement with the numpy kernel is sub-nanometer
    (both are IEEE double evaluations of the identical series), so
    rounded downstream aggregates hash-match."""
    e = repr(float(_E))
    abar = repr(float(_A_BAR))
    alpha = [repr(float(a)) for a in _ALPHA]
    xi_terms = " ".join(
        f"+ {alpha[j - 1]}*sin(2*{j}*_g_xip)*(exp(2*{j}*_g_etap)+exp(-2*{j}*_g_etap))/2.0"
        for j in range(1, 7)
    )
    eta_terms = " ".join(
        f"+ {alpha[j - 1]}*cos(2*{j}*_g_xip)*(exp(2*{j}*_g_etap)-exp(-2*{j}*_g_etap))/2.0"
        for j in range(1, 7)
    )
    return f"""
SELECT * EXCLUDE (_g_dlam, _g_sphi, _g_u, _g_t, _g_cdl, _g_sdl, _g_xip, _g_etap, _g_xi, _g_eta),
       {abar}*_g_eta + {zone}*1e6 + 5e5 AS x,
       {abar}*_g_xi AS y
FROM (
  SELECT *, _g_xip {xi_terms} AS _g_xi, _g_etap {eta_terms} AS _g_eta
  FROM (
    SELECT *, atan2(_g_t, _g_cdl) AS _g_xip,
           ln(_g_sdl/sqrt(_g_t*_g_t+_g_cdl*_g_cdl) + sqrt(_g_sdl*_g_sdl/(_g_t*_g_t+_g_cdl*_g_cdl) + 1.0)) AS _g_etap
    FROM (
      SELECT *, (exp(_g_u)-exp(-_g_u))/2.0 AS _g_t, cos(_g_dlam) AS _g_cdl, sin(_g_dlam) AS _g_sdl
      FROM (
        SELECT *, 0.5*ln((1+_g_sphi)/(1-_g_sphi)) - {e}*0.5*ln((1+{e}*_g_sphi)/(1-{e}*_g_sphi)) AS _g_u
        FROM (
          SELECT *, radians({lon} - (({zone}-1)*6.0 - 180.0 + 3.0)) AS _g_dlam,
                 least(greatest(sin(radians({lat})), -{repr(_SPHI_MAX)}), {repr(_SPHI_MAX)}) AS _g_sphi
          FROM ({src})
        )
      )
    )
  )
)
"""


# Gauss-plane validity box (reference G:5088-5091) and the safe-buffer
# clamp constants (G:5122, G:442/5131)
GAUSS_X_MIN, GAUSS_X_MAX = 5e5, 6.4e7
GAUSS_Y_MIN, GAUSS_Y_MAX = -1e7, 1e7
SAFE_BUFFER_MARGIN = 0.9
MIN_BUFFER_DISTANCE = 1.0


def calculate_safe_buffer(
    x_min: float, y_min: float, x_max: float, y_max: float, requested_m: float
) -> float:
    """calculateSafeBuffer (G:5064-5143): clamp a requested buffer
    distance so the buffered envelope stays inside the Gauss plane's
    valid box — at most 0.9x the smallest margin to a box edge —
    floored at MIN_BUFFER_DISTANCE (1 m). Pure arithmetic; the Column
    twin is the same min/greatest chain."""
    margin = min(
        x_min - GAUSS_X_MIN,
        GAUSS_X_MAX - x_max,
        y_min - GAUSS_Y_MIN,
        GAUSS_Y_MAX - y_max,
    )
    return float(max(min(requested_m, SAFE_BUFFER_MARGIN * margin), MIN_BUFFER_DISTANCE))


def safe_buffer_expr(x_min, y_min, x_max, y_max, requested_m):
    """Column form of calculate_safe_buffer — the same min/clamp chain
    over Column inputs (exact IEEE ops in the same order, so the
    DuckDB least/greatest restatement is a bit-identical twin; pinned
    scalar-vs-Column in tests/test_plots_and_windows.py). Inputs must
    be non-null — least/greatest are NULL-SKIPPING in Spark and
    DuckDB, so a NULL bound would silently drop a margin term instead
    of poisoning the result (same caveat as geo/cells.py)."""
    from pyspark.sql import functions as F

    margin = F.least(
        x_min - F.lit(GAUSS_X_MIN),
        F.lit(GAUSS_X_MAX) - x_max,
        y_min - F.lit(GAUSS_Y_MIN),
        F.lit(GAUSS_Y_MAX) - y_max,
    )
    return F.greatest(
        F.least(requested_m, F.lit(SAFE_BUFFER_MARGIN) * margin),
        F.lit(MIN_BUFFER_DISTANCE),
    )


def unified_zone(lon_min: float, lon_max: float) -> int:
    """Zone of the batch center, the reference's unified-zone rule
    (G:12411-12422): whole trajectory projected in one zone to avoid
    cross-zone seams."""
    return int(zone_from_lon((lon_min + lon_max) / 2.0))


def unified_zone_of(lon: np.ndarray) -> int:
    """unified_zone over an array's FINITE extent — the ONE NaN-safe
    form every per-group projection kernel must use (r6 review: two
    call sites computed the extent from raw min/max, so one NaN lon
    clipped the zone to 1 and silently projected the whole batch ~180
    degrees off). All-NaN input returns zone 1; the forward projection
    of those rows is NaN anyway."""
    finite = lon[np.isfinite(lon)]
    if len(finite) == 0:
        return 1
    return unified_zone(float(finite.min()), float(finite.max()))
