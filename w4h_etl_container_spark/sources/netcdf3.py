"""SRC-2/SRC-3 — the array-file ingestion boundary: NetCDF classic ⇄
long-form parquet, with zero native dependencies.

The reference opens gridded forecasts as xarray datasets — remote OPeNDAP
(``/root/reference/main.py:81``, ``utils.py:45-54``) and local NetCDF
snapshots (``main.py:247,281``) — then works on (lat, lon, time) cubes.
This engine's ingestion boundary is long-form parquet (one row per
cell-hour); this module is the converter that closes the loop for a user
arriving with .nc files.

No xarray/netCDF4/scipy exist in this container, so the codec implements
the public NetCDF *classic* (CDF-1) binary format directly — magic
``CDF\\x01``, big-endian header of dim/attr/var lists, 4-byte-aligned
fixed-size variable data (spec: Unidata "NetCDF Classic Format
Specification"). That covers the interchange subset the reference's
pipeline needs: double/float/int variables over fixed dimensions with
text attributes. A deployment with netCDF4 installed can swap
``read_netcdf3``/``write_netcdf3`` for the library calls; the
grid⇄long-form reshaping on either side is the part that matters to the
engine and is identical. Scope boundary: this codec covers NetCDF
classic (CDF-1/CDF-2) only; the reference's actual mask file
(``near_land_complete_globe.nc``) is NetCDF-4, i.e. an HDF5 container,
and is ingested by the sibling ``sources/hdf5.py`` reader (golden-tested
against that artifact).

At scale the converter is a per-file map (one .nc file → one parquet
write): parallelize by file with ``spark.read.format("binaryFile")`` or
a driver-side loop — each cube converts independently, so ingestion
throughput scales linearly with file count.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

_MAGIC = b"CDF\x01"
_NC_DIMENSION = 0x0A
_NC_VARIABLE = 0x0B
_NC_ATTRIBUTE = 0x0C

_NC_BYTE, _NC_CHAR, _NC_SHORT, _NC_INT, _NC_FLOAT, _NC_DOUBLE = 1, 2, 3, 4, 5, 6
_DTYPES = {
    _NC_BYTE: np.dtype(">i1"),
    _NC_CHAR: np.dtype("S1"),
    _NC_SHORT: np.dtype(">i2"),
    _NC_INT: np.dtype(">i4"),
    _NC_FLOAT: np.dtype(">f4"),
    _NC_DOUBLE: np.dtype(">f8"),
}
_NC_TYPE_OF = {
    np.dtype("int8"): _NC_BYTE,
    np.dtype("int16"): _NC_SHORT,
    np.dtype("int32"): _NC_INT,
    np.dtype("float32"): _NC_FLOAT,
    np.dtype("float64"): _NC_DOUBLE,
}


def _pad4(n: int) -> int:
    return (4 - n % 4) % 4


@dataclass
class NcVar:
    name: str
    dims: tuple[str, ...]
    data: np.ndarray
    attrs: dict[str, str] = field(default_factory=dict)


@dataclass
class NcFile:
    dims: dict[str, int]
    variables: dict[str, NcVar]
    attrs: dict[str, str] = field(default_factory=dict)


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------
def _w_name(out: bytearray, name: str) -> None:
    b = name.encode()
    out += struct.pack(">i", len(b)) + b + b"\x00" * _pad4(len(b))


def _w_attrs(out: bytearray, attrs: dict[str, str]) -> None:
    if not attrs:
        out += struct.pack(">ii", 0, 0)  # ABSENT
        return
    out += struct.pack(">ii", _NC_ATTRIBUTE, len(attrs))
    for k, v in attrs.items():
        _w_name(out, k)
        b = v.encode()
        out += struct.pack(">ii", _NC_CHAR, len(b)) + b + b"\x00" * _pad4(len(b))


def write_netcdf3(nc: NcFile, path: str) -> None:
    """Serialize fixed-dimension variables as a CDF-1 classic file."""
    dim_names = list(nc.dims)
    header = bytearray(_MAGIC)
    header += struct.pack(">i", 0)  # numrecs (no record dimension used)
    # dimensions
    header += struct.pack(">ii", _NC_DIMENSION, len(dim_names))
    for d in dim_names:
        _w_name(header, d)
        header += struct.pack(">i", nc.dims[d])
    _w_attrs(header, nc.attrs)
    # variable headers (begin offsets patched after sizing)
    header += struct.pack(">ii", _NC_VARIABLE, len(nc.variables))
    begin_slots: list[tuple[int, int]] = []  # (slot offset in header, vsize)
    for v in nc.variables.values():
        nct = _NC_TYPE_OF[v.data.dtype.newbyteorder("=")]
        _w_name(header, v.name)
        header += struct.pack(">i", len(v.dims))
        for d in v.dims:
            header += struct.pack(">i", dim_names.index(d))
        _w_attrs(header, v.attrs)
        size = v.data.size * _DTYPES[nct].itemsize
        vsize = size + _pad4(size)
        header += struct.pack(">ii", nct, vsize)
        begin_slots.append((len(header), vsize))
        header += struct.pack(">i", 0)  # begin placeholder (CDF-1: 4 bytes)
    # patch begins
    offset = len(header)
    for slot, vsize in begin_slots:
        header[slot : slot + 4] = struct.pack(">i", offset)
        offset += vsize
    with open(path, "wb") as f:
        f.write(header)
        for v in nc.variables.values():
            nct = _NC_TYPE_OF[v.data.dtype.newbyteorder("=")]
            raw = np.ascontiguousarray(v.data, dtype=_DTYPES[nct]).tobytes()
            f.write(raw + b"\x00" * _pad4(len(raw)))


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------
class _Cursor:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def i4(self) -> int:
        (v,) = struct.unpack_from(">i", self.buf, self.pos)
        self.pos += 4
        return v

    def name(self) -> str:
        n = self.i4()
        s = self.buf[self.pos : self.pos + n].decode()
        self.pos += n + _pad4(n)
        return s

    def attrs(self) -> dict[str, str]:
        tag, count = self.i4(), self.i4()
        out: dict[str, str] = {}
        for _ in range(count):
            k = self.name()
            nct, n = self.i4(), self.i4()
            width = _DTYPES[nct].itemsize
            raw = self.buf[self.pos : self.pos + n * width]
            self.pos += n * width + _pad4(n * width)
            out[k] = raw.decode() if nct == _NC_CHAR else repr(
                np.frombuffer(raw, dtype=_DTYPES[nct]).tolist()
            )
        return out


def read_netcdf3(path: str) -> NcFile:
    """Parse a CDF-1/CDF-2 classic file (fixed dimensions)."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:3] != b"CDF" or buf[3] not in (1, 2):
        raise ValueError(f"{path}: not a NetCDF classic file")
    is_cdf2 = buf[3] == 2
    cur = _Cursor(buf)
    cur.pos = 4
    cur.i4()  # numrecs
    tag, ndims = cur.i4(), cur.i4()
    dim_names: list[str] = []
    dims: dict[str, int] = {}
    for _ in range(ndims):
        nm = cur.name()
        dims[nm] = cur.i4()
        dim_names.append(nm)
    gattrs = cur.attrs()
    tag, nvars = cur.i4(), cur.i4()
    variables: dict[str, NcVar] = {}
    for _ in range(nvars):
        nm = cur.name()
        nd = cur.i4()
        vdims = tuple(dim_names[cur.i4()] for _ in range(nd))
        vattrs = cur.attrs()
        nct = cur.i4()
        cur.i4()  # vsize
        begin = cur.i4() if not is_cdf2 else (cur.i4() << 32) | (cur.i4() & 0xFFFFFFFF)
        shape = tuple(dims[d] for d in vdims)
        count = int(np.prod(shape)) if shape else 1
        dt = _DTYPES[nct]
        data = (
            np.frombuffer(buf, dtype=dt, count=count, offset=begin)
            .reshape(shape)
            .astype(dt.newbyteorder("="))
        )
        variables[nm] = NcVar(nm, vdims, data, vattrs)
    return NcFile(dims=dims, variables=variables, attrs=gattrs)


# ---------------------------------------------------------------------------
# grid cube ⇄ long form (the engine's ingestion boundary)
# ---------------------------------------------------------------------------
_TIME_UNITS = "hours since 1970-01-01T00:00:00"


def long_to_grid_nc(df: pd.DataFrame, path: str, value_cols: list[str]) -> None:
    """Long-form (lat, lon, ts, vars) → a (lat, lon, time) NetCDF cube.
    Missing cell-hours become NaN (NetCDF cubes are dense); hourly epochs
    are exact in the double time coordinate."""
    lat = np.sort(df["lat"].unique())
    lon = np.sort(df["lon"].unique())
    ts = np.sort(df["ts"].unique())
    hours = (ts.astype("datetime64[s]").astype(np.int64) / 3600.0).astype(np.float64)
    ix_lat = pd.Series(np.arange(len(lat)), index=lat)
    ix_lon = pd.Series(np.arange(len(lon)), index=lon)
    ix_ts = pd.Series(np.arange(len(ts)), index=ts)
    ii = ix_lat[df["lat"]].to_numpy()
    jj = ix_lon[df["lon"]].to_numpy()
    kk = ix_ts[df["ts"]].to_numpy()
    variables: dict[str, NcVar] = {
        "lat": NcVar("lat", ("lat",), lat.astype(np.float64), {"units": "degrees_north"}),
        "lon": NcVar("lon", ("lon",), lon.astype(np.float64), {"units": "degrees_east"}),
        "time": NcVar("time", ("time",), hours, {"units": _TIME_UNITS}),
    }
    for c in value_cols:
        cube = np.full((len(lat), len(lon), len(ts)), np.nan, dtype=np.float64)
        cube[ii, jj, kk] = df[c].to_numpy(dtype=np.float64)
        variables[c] = NcVar(c, ("lat", "lon", "time"), cube)
    nc = NcFile(
        dims={"lat": len(lat), "lon": len(lon), "time": len(ts)},
        variables=variables,
        attrs={"source": "w4h_etl_container_spark gridgen"},
    )
    write_netcdf3(nc, path)


def grid_nc_to_long(path: str) -> pd.DataFrame:
    """A (lat, lon, time) NetCDF cube → the engine's long-form frame
    (lat, lon, ts, one column per cube variable), NaN cell-hours intact."""
    nc = read_netcdf3(path)
    lat = nc.variables["lat"].data
    lon = nc.variables["lon"].data
    hours = nc.variables["time"].data
    ts = (hours * 3600.0).astype("datetime64[s]").astype("datetime64[us]")
    la, lo, tt = np.meshgrid(lat, lon, np.arange(len(ts)), indexing="ij")
    out = {
        "lat": la.ravel(),
        "lon": lo.ravel(),
        "ts": ts[tt.ravel()],
    }
    for name, v in nc.variables.items():
        if v.dims == ("lat", "lon", "time"):
            out[name] = v.data.ravel()
    return pd.DataFrame(out)


def grid_nc_to_parquet(nc_path: str, parquet_path: str) -> int:
    """The SRC-2 converter a reference user runs on day one: .nc forecast
    file → long-form parquet the engine scans. Returns the row count."""
    df = grid_nc_to_long(nc_path)
    df.to_parquet(parquet_path, index=False)
    return len(df)
