"""sources/hdf5.py — the NetCDF-4 (HDF5) ingestion boundary.

Two-sided coverage: a GOLDEN test against the reference's real mask
artifact (``/root/reference/near_land_complete_globe.nc`` — superblock
v0, v2 object headers, compact link groups, contiguous storage), and a
BYTE-CRAFTED fixture exercising the paths the real file doesn't: v1
object headers, old-style symbol-table groups, chunked layout behind a
v1 B-tree, the shuffle + deflate filter pipeline, and fill for chunks
the index omits. The crafted bytes follow the public HDF5 File Format
Specification directly, so the test doubles as a spec pin for the
reader's assumptions.
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np
import pytest

REF_MASK = "/root/reference/near_land_complete_globe.nc"

_UNDEF = 0xFFFFFFFFFFFFFFFF


class TestRealMaskGolden:
    """The one reference artifact the CDF-1/2 codec couldn't ingest."""

    @pytest.fixture(scope="class")
    def sets(self):
        if not os.path.exists(REF_MASK):
            pytest.skip("reference mask artifact not present")
        from w4h_etl_container_spark.sources.hdf5 import read_hdf5

        return read_hdf5(REF_MASK)

    def test_structure(self, sets):
        assert set(sets) == {"lat", "lon", "near_land"}
        assert sets["near_land"].shape == (721, 1440)  # 0.25° global grid
        assert sets["lat"].attrs["CLASS"] == "DIMENSION_SCALE"
        assert sets["lon"].attrs["CLASS"] == "DIMENSION_SCALE"

    def test_coordinates(self, sets):
        lat, lon = sets["lat"].read(), sets["lon"].read()
        assert lat.dtype == np.float32 and lon.dtype == np.float32
        np.testing.assert_allclose([lat[0], lat[-1]], [-90.0, 90.0])
        np.testing.assert_allclose([lon[0], lon[-1]], [0.0, 359.75])
        np.testing.assert_allclose(np.diff(lat), 0.25)

    def test_mask_values(self, sets):
        m = sets["near_land"].read()
        assert m.dtype == np.int8
        assert set(np.unique(m)) == {0, 1}
        # pinned from the artifact: the near-land cell count is a stable
        # fact of the file — any parsing drift (offsets, byte order,
        # layout) almost surely changes it
        assert int(m.sum()) == 421399

    def test_long_form(self, sets):
        from w4h_etl_container_spark.sources.hdf5 import mask_nc4_to_long

        df = mask_nc4_to_long(REF_MASK)
        assert list(df.columns) == ["lat", "lon", "near_land"]
        assert len(df) == 721 * 1440
        assert int((df["near_land"] != 0).sum()) == 421399
        # row order is axis-major: first block is the south-pole row
        assert df["lat"].iloc[0] == -90.0 and df["lon"].iloc[1] == 0.25

    def test_broadcast_mask_join_boundary(self, sets, spark):
        """The reference zips the mask against forecast rows
        (main.py:281-304); at this engine's boundary that's a broadcast
        join of the long-form mask — prove the frame crosses into Spark
        with its dtypes intact."""
        from pyspark.sql import functions as F

        from w4h_etl_container_spark.sources.hdf5 import mask_nc4_to_long

        mask = spark.createDataFrame(mask_nc4_to_long(REF_MASK))
        near = mask.where(F.col("near_land") == 1)
        assert near.count() == 421399
        assert dict(mask.dtypes)["near_land"] == "tinyint"


def _craft_chunked_file(path: str, arr: np.ndarray) -> None:
    """Write a minimal HDF5 file the OLD way: superblock v0, v1 object
    headers, a symbol-table root group, and one chunked int32 dataset
    ("data", 3×5, 2×3 chunks) filtered by shuffle+deflate — with the
    last chunk deliberately absent from the B-tree so [2, 3:5] must come
    from fill. Offsets are computed inline; every structure follows the
    public spec section cited next to it."""
    assert arr.shape == (3, 5) and arr.dtype == np.dtype("<i4")
    chunk_shape = (2, 3)

    def chunk_bytes(r0, c0):
        full = np.zeros(chunk_shape, dtype="<i4")  # HDF5 stores full chunks
        sel = arr[r0 : r0 + 2, c0 : c0 + 3]
        full[: sel.shape[0], : sel.shape[1]] = sel
        raw = full.tobytes()
        n = len(raw) // 4  # shuffle: transpose to byte planes
        shuffled = np.frombuffer(raw, dtype="u1").reshape(n, 4).T.tobytes()
        return zlib.compress(shuffled, 6)

    chunks = [(0, 0), (0, 3), (2, 0)]  # (2, 3) omitted → fill
    payloads = {rc: chunk_bytes(*rc) for rc in chunks}

    sb_end = 96
    root_hdr = 96        # 16 + one 24-byte symbol-table message = 40
    heap = 136           # 32-byte header + 32-byte data segment
    heap_data = 168
    gbtree = 200         # 48 bytes (1 entry)
    snod = 248           # 8 + 40 = 48 bytes
    dset_hdr = 296       # 16 + 136 = 152 bytes
    cbtree = 448         # 24 + 3*(40) + 32 = 176 bytes
    data_at = 624
    offs, pos = {}, data_at
    for rc in chunks:
        offs[rc] = pos
        pos += len(payloads[rc])
    eof = pos

    out = bytearray()
    # superblock v0 (spec II.A.1) + root symbol-table entry (III.C)
    out += b"\x89HDF\r\n\x1a\n" + bytes([0, 0, 0, 0, 0, 8, 8, 0])
    out += struct.pack("<HHI", 4, 16, 0)
    out += struct.pack("<QQQQ", 0, _UNDEF, eof, _UNDEF)
    out += struct.pack("<QQII", 0, root_hdr, 0, 0) + b"\0" * 16
    assert len(out) == sb_end
    # root object header v1 (IV.A.1): one symbol-table message (0x11)
    out += struct.pack("<BBHII", 1, 0, 1, 1, 24) + b"\0" * 4
    out += struct.pack("<HHBBBB", 0x11, 16, 0, 0, 0, 0) + struct.pack("<QQ", gbtree, heap)
    assert len(out) == heap
    # local heap (III.D): data segment holds "" then "data"
    out += b"HEAP" + bytes([0, 0, 0, 0]) + struct.pack("<QQQ", 32, _UNDEF, heap_data)
    out += b"\0" * 8 + b"data\0\0\0\0" + b"\0" * 16
    assert len(out) == gbtree
    # group B-tree v1, type 0 (III.A.1): one SNOD child
    out += b"TREE" + bytes([0, 0]) + struct.pack("<H", 1)
    out += struct.pack("<QQ", _UNDEF, _UNDEF) + struct.pack("<QQQ", 0, snod, 8)
    assert len(out) == snod
    # symbol table node (III.C): "data" → dataset header
    out += b"SNOD" + bytes([1, 0]) + struct.pack("<H", 1)
    out += struct.pack("<QQII", 8, dset_hdr, 0, 0) + b"\0" * 16
    assert len(out) == dset_hdr
    # dataset object header v1: dataspace, datatype, filters, layout
    out += struct.pack("<BBHII", 1, 0, 4, 1, 136) + b"\0" * 4
    out += struct.pack("<HHI", 0x01, 24, 0)  # dataspace v1, rank 2
    out += bytes([1, 2, 0]) + b"\0" * 5 + struct.pack("<QQ", 3, 5)
    out += struct.pack("<HHI", 0x03, 16, 0)  # datatype: LE signed i4
    out += bytes([0x10, 0x08, 0, 0]) + struct.pack("<I", 4)
    out += struct.pack("<HHI", 0, 32, 0)  # properties + pad to 16
    out += struct.pack("<HHI", 0x0B, 40, 0)  # filter pipeline v1
    out += bytes([1, 2]) + b"\0" * 6
    out += struct.pack("<HHHH", 2, 0, 0, 1) + struct.pack("<I", 4) + b"\0" * 4  # shuffle(4)
    out += struct.pack("<HHHH", 1, 0, 0, 1) + struct.pack("<I", 6) + b"\0" * 4  # deflate(6)
    out += struct.pack("<HHI", 0x08, 24, 0)  # layout v3, chunked
    out += bytes([3, 2, 3]) + struct.pack("<Q", cbtree)
    out += struct.pack("<III", 2, 3, 4) + b"\0"
    assert len(out) == cbtree
    # chunk B-tree v1, type 1 (III.A.1): 3 chunk records + closing key
    out += b"TREE" + bytes([1, 0]) + struct.pack("<H", 3)
    out += struct.pack("<QQ", _UNDEF, _UNDEF)
    for rc in chunks:
        out += struct.pack("<II", len(payloads[rc]), 0)
        out += struct.pack("<QQQ", rc[0], rc[1], 0)
        out += struct.pack("<Q", offs[rc])
    out += struct.pack("<II", 0, 0) + struct.pack("<QQQ", 4, 6, 0)  # closing key
    assert len(out) == data_at
    for rc in chunks:
        out += payloads[rc]
    with open(path, "wb") as f:
        f.write(bytes(out))


class TestCraftedChunked:
    def test_chunked_shuffle_deflate_and_fill(self, tmp_path):
        from w4h_etl_container_spark.sources.hdf5 import read_hdf5

        arr = np.arange(15, dtype="<i4").reshape(3, 5)
        p = str(tmp_path / "crafted.h5")
        _craft_chunked_file(p, arr)
        sets = read_hdf5(p)
        assert set(sets) == {"data"}
        d = sets["data"]
        assert d.shape == (3, 5) and d.dtype == np.dtype("<i4")
        got = d.read()
        want = arr.copy()
        want[2, 3:5] = 0  # absent chunk → default fill
        np.testing.assert_array_equal(got, want)


def _craft_dense_group_file(path: str, arrays: dict, btree_depth: int = 0) -> None:
    """Write an HDF5 file whose root group stores its links DENSELY —
    Link Info message → fractal heap (one direct root block) of Link
    messages, indexed by a v2 B-tree (leaf root, or one internal level
    when ``btree_depth=1``). This is the layout netCDF-4 emits past the
    compact-link threshold; no libhdf5 exists in this container, so the
    bytes follow the public spec (III.G fractal heap, III.A.2 v2
    B-tree) field by field. Datasets are 1-D contiguous ``<i4``/``<f4``
    under v1 object headers."""
    names = list(arrays)
    n = len(names)
    assert btree_depth in (0, 1)
    if btree_depth == 1:
        assert n == 3, "depth-1 crafting places 1 root record + 2 single-record leaves"

    SB_SZ, ROOT_SZ, DSHDR_SZ, FRHP_SZ, FHDB_SZ, BTHD_SZ = 48, 33, 88, 146, 512, 38
    link_sizes = [2 + 1 + len(nm.encode()) + 8 for nm in names]
    fhdb_hdr = 4 + 1 + 8 + 4  # sig, ver, heap hdr addr, 32-bit block offset
    assert fhdb_hdr + sum(link_sizes) <= FHDB_SZ

    sb_at = 0
    root_at = SB_SZ
    ds_at = [root_at + ROOT_SZ + i * DSHDR_SZ for i in range(n)]
    frhp_at = root_at + ROOT_SZ + n * DSHDR_SZ
    fhdb_at = frhp_at + FRHP_SZ
    bthd_at = fhdb_at + FHDB_SZ
    if btree_depth == 0:
        btlf_at = bthd_at + BTHD_SZ
        btlf_sz = 6 + 11 * n + 4
        data_at = btlf_at + btlf_sz
    else:
        btin_at = bthd_at + BTHD_SZ
        btin_sz = 6 + 11 * 1 + 2 * (8 + 1) + 4  # 1 record, 2 child ptrs (nrec size 1)
        leaf_sz = 6 + 11 * 1 + 4
        leaf_ats = [btin_at + btin_sz, btin_at + btin_sz + leaf_sz]
        data_at = btin_at + btin_sz + 2 * leaf_sz
    data_ats, pos = [], data_at
    for nm in names:
        data_ats.append(pos)
        pos += arrays[nm].nbytes
    eof = pos

    out = bytearray()
    # superblock v2 (spec II.A.2)
    out += b"\x89HDF\r\n\x1a\n" + bytes([2, 8, 8, 0])
    out += struct.pack("<QQQQ", 0, _UNDEF, eof, root_at) + b"\0\0\0\0"
    assert len(out) == SB_SZ
    # root object header v2: one Link Info message, chunk-0 size EXCLUDES
    # the trailing checksum (the boundary the reader pins)
    out += b"OHDR" + bytes([2, 0x00, 22])  # version, flags, size-of-chunk-0
    out += bytes([0x02, 18, 0, 0])  # msg: type=Link Info, size, flags, body...
    out += bytes([0, 0]) + struct.pack("<QQ", frhp_at, bthd_at)
    out += b"\0\0\0\0"  # checksum (not verified)
    assert len(out) == root_at + ROOT_SZ
    # dataset object headers (v1): dataspace, datatype, contiguous layout
    for i, nm in enumerate(names):
        arr = arrays[nm]
        out += struct.pack("<BBHII", 1, 0, 3, 1, 72) + b"\0" * 4
        out += struct.pack("<HHI", 0x01, 16, 0)
        out += bytes([1, 1, 0]) + b"\0" * 5 + struct.pack("<Q", arr.shape[0])
        out += struct.pack("<HHI", 0x03, 8, 0)
        cls_bits = bytes([0x10, 0x08, 0, 0]) if arr.dtype.kind == "i" else bytes([0x11, 0x20, 0, 0])
        out += cls_bits + struct.pack("<I", arr.dtype.itemsize)
        out += struct.pack("<HHI", 0x08, 24, 0)
        out += bytes([3, 1]) + struct.pack("<QQ", data_ats[i], arr.nbytes) + b"\0" * 6
        assert len(out) == ds_at[i] + DSHDR_SZ
    # fractal heap header (III.G): managed-only, unfiltered, direct root
    out += b"FRHP" + bytes([0]) + struct.pack("<HH", 7, 0) + bytes([0])
    out += struct.pack("<I", 512)  # max size of managed objects
    out += struct.pack("<QQ", 0, _UNDEF)  # next huge id, huge btree
    out += struct.pack("<QQ", 0, _UNDEF)  # free space, fs manager
    out += struct.pack("<QQQQ", 512, 512, 0, n)  # managed/alloc/iter/nobj
    out += struct.pack("<QQQQ", 0, 0, 0, 0)  # huge/tiny sizes + counts
    out += struct.pack("<HQQHH", 4, 512, 4096, 32, 1)  # width,start,maxdir,bits,rows
    out += struct.pack("<QH", fhdb_at, 0)  # root block addr, cur rows (0=direct)
    out += b"\0\0\0\0"
    assert len(out) == frhp_at + FRHP_SZ
    # direct block: header then the link messages back to back
    out += b"FHDB" + bytes([0]) + struct.pack("<QI", frhp_at, 0)
    heap_offs = []
    off = fhdb_hdr
    for nm, ls, tgt in zip(names, link_sizes, ds_at):
        heap_offs.append(off)
        enc = nm.encode()
        out += bytes([1, 0, len(enc)]) + enc + struct.pack("<Q", tgt)
        off += ls
    out += b"\0" * (FHDB_SZ - fhdb_hdr - sum(link_sizes))
    assert len(out) == bthd_at

    def record(i: int) -> bytes:
        # name-hash (unverified) + managed heap ID: type/version byte,
        # 32-bit heap offset, 16-bit length
        return b"\0\0\0\0" + bytes([0]) + struct.pack("<IH", heap_offs[i], link_sizes[i])

    root_nrec = n if btree_depth == 0 else 1
    root_node = btlf_at if btree_depth == 0 else btin_at
    out += b"BTHD" + bytes([0, 5]) + struct.pack("<IHH", 512, 11, btree_depth)
    out += bytes([100, 40]) + struct.pack("<QHQ", root_node, root_nrec, n)
    out += b"\0\0\0\0"
    assert len(out) == bthd_at + BTHD_SZ
    if btree_depth == 0:
        out += b"BTLF" + bytes([0, 5]) + b"".join(record(i) for i in range(n))
        out += b"\0\0\0\0"
        assert len(out) == data_at
    else:
        # internal root: child0, record "names[1]", child1 — in-tree
        # order leaf0 < rec < leaf1 (hash order is not checked on read)
        out += b"BTIN" + bytes([0, 5]) + record(1)
        out += struct.pack("<QB", leaf_ats[0], 1) + struct.pack("<QB", leaf_ats[1], 1)
        out += b"\0\0\0\0"
        for li, ridx in zip(leaf_ats, (0, 2)):
            assert len(out) == li
            out += b"BTLF" + bytes([0, 5]) + record(ridx) + b"\0\0\0\0"
        assert len(out) == data_at
    for nm in names:
        out += arrays[nm].tobytes()
    with open(path, "wb") as f:
        f.write(bytes(out))


class TestCraftedDenseGroup:
    """Dense (fractal-heap) group links — the modern multi-variable
    netCDF-4 layout the round-6 reader raised on."""

    def test_dense_links_leaf_root(self, tmp_path):
        from w4h_etl_container_spark.sources.hdf5 import read_hdf5

        arrays = {
            "alpha": np.arange(4, dtype="<i4"),
            "beta": np.array([1.5, -2.5, 4.0], dtype="<f4"),
            "gamma": np.arange(10, 15, dtype="<i4"),
        }
        p = str(tmp_path / "dense.h5")
        _craft_dense_group_file(p, arrays, btree_depth=0)
        sets = read_hdf5(p)
        assert set(sets) == set(arrays)
        for nm, arr in arrays.items():
            assert sets[nm].shape == arr.shape
            np.testing.assert_array_equal(sets[nm].read(), arr)

    def test_dense_links_one_internal_level(self, tmp_path):
        from w4h_etl_container_spark.sources.hdf5 import read_hdf5

        arrays = {
            "a": np.arange(3, dtype="<i4"),
            "b": np.array([9.0, 8.0], dtype="<f4"),
            "c": np.arange(6, dtype="<i4"),
        }
        p = str(tmp_path / "dense_deep.h5")
        _craft_dense_group_file(p, arrays, btree_depth=1)
        sets = read_hdf5(p)
        assert set(sets) == set(arrays)
        for nm, arr in arrays.items():
            np.testing.assert_array_equal(sets[nm].read(), arr)

    def test_corrupt_depth_header_raises_clearly(self, tmp_path):
        # pre-r8 this raised NotImplementedError("depth > 1"); deep
        # trees are now traversed, so a header CLAIMING depth 2 over a
        # leaf root is detected as corruption (root isn't BTIN)
        from w4h_etl_container_spark.sources.hdf5 import H5File

        arrays = {"a": np.arange(3, dtype="<i4"), "b": np.arange(2, dtype="<i4"),
                  "c": np.arange(2, dtype="<i4")}
        p = str(tmp_path / "deep.h5")
        _craft_dense_group_file(p, arrays, btree_depth=0)
        buf = bytearray(open(p, "rb").read())
        at = bytes(buf).index(b"BTHD")
        struct.pack_into("<H", buf, at + 12, 2)
        p2 = str(tmp_path / "deep2.h5")
        open(p2, "wb").write(bytes(buf))
        with pytest.raises(ValueError, match="internal node"):
            H5File(p2)


class TestV2BtreeAnyDepth:
    """Round 8: v2 B-tree traversal at arbitrary depth, against an
    INDEPENDENT tree builder that computes the spec's per-level
    child-pointer widths itself and serializes partially-filled nodes.
    (netCDF-4 needs depth ≤ 1; this pins the >3k-variable case the r7
    reader refused.)"""

    NODE_SIZE = 64
    REC_SIZE = 8

    def _capacities(self, depth):
        bytes_for = lambda v: max(1, (v.bit_length() + 7) // 8)  # noqa: E731
        max_nrec = {0: (self.NODE_SIZE - 10) // self.REC_SIZE}
        cum = {0: max_nrec[0]}
        for d in range(1, depth + 1):
            ptr = 8 + bytes_for(max_nrec[d - 1]) + (
                bytes_for(cum[d - 1]) if d > 1 else 0
            )
            cap = (self.NODE_SIZE - 10 - ptr) // (self.REC_SIZE + ptr)
            max_nrec[d] = cap
            cum[d] = cum[d - 1] * (cap + 1) + cap
        return max_nrec, cum

    def _build(self, depth):
        """Return (buffer, expected_records) for a tree of the given
        depth with non-full nodes (leaves hold 3 of 6, internals the
        lesser of 2 and capacity)."""
        bytes_for = lambda v: max(1, (v.bit_length() + 7) // 8)  # noqa: E731
        max_nrec, cum = self._capacities(depth)

        def shape(d):
            nrec = 3 if d == 0 else min(2, max_nrec[d])
            assert nrec >= 1
            node = {"d": d, "recs": [None] * nrec, "children": []}
            if d > 0:
                node["children"] = [shape(d - 1) for _ in range(nrec + 1)]
            return node

        root = shape(depth)

        # assign record values in IN-ORDER position so the expected
        # sequence is simply ascending
        counter = iter(range(10_000))

        def assign(n):
            if n["d"] == 0:
                n["recs"] = [struct.pack("<Q", next(counter)) for _ in n["recs"]]
                return
            recs = []
            for i, c in enumerate(n["children"]):
                assign(c)
                if i < len(n["recs"]):
                    recs.append(struct.pack("<Q", next(counter)))
            n["recs"] = recs

        assign(root)
        expected = []

        def inorder(n):
            if n["d"] == 0:
                expected.extend(n["recs"])
                return
            for i, c in enumerate(n["children"]):
                inorder(c)
                if i < len(n["recs"]):
                    expected.append(n["recs"][i])

        inorder(root)

        # assign addresses: header (32 B) then nodes in DFS order
        nodes = []

        def collect(n):
            nodes.append(n)
            for c in n["children"]:
                collect(c)

        collect(root)
        header_size = 32
        for i, n in enumerate(nodes):
            n["addr"] = header_size + i * self.NODE_SIZE

        def total_recs(n):
            return len(n["recs"]) + sum(total_recs(c) for c in n["children"])

        out = bytearray()
        out += b"BTHD" + bytes([0, 5])
        out += struct.pack("<I", self.NODE_SIZE)
        out += struct.pack("<HH", self.REC_SIZE, depth)
        out += bytes([100, 40])  # split/merge percents
        out += struct.pack("<QH", root["addr"], len(root["recs"]))
        assert len(out) <= header_size
        out += b"\0" * (header_size - len(out))
        for n in nodes:
            blob = bytearray()
            if n["d"] == 0:
                blob += b"BTLF" + bytes([0, 5])
                for r in n["recs"]:
                    blob += r
            else:
                blob += b"BTIN" + bytes([0, 5])
                for r in n["recs"]:
                    blob += r
                sz_nrec = bytes_for(max_nrec[n["d"] - 1])
                sz_tot = bytes_for(cum[n["d"] - 1]) if n["d"] > 1 else 0
                for c in n["children"]:
                    blob += struct.pack("<Q", c["addr"])
                    blob += len(c["recs"]).to_bytes(sz_nrec, "little")
                    if sz_tot:
                        blob += total_recs(c).to_bytes(sz_tot, "little")
            assert len(blob) <= self.NODE_SIZE, (n["d"], len(blob))
            blob += b"\0" * (self.NODE_SIZE - len(blob))
            out += blob
        return bytes(out), expected

    @pytest.mark.parametrize("depth", [0, 1, 2, 3])
    def test_traversal_any_depth(self, depth):
        from w4h_etl_container_spark.sources.hdf5 import H5File

        buf, expected = self._build(depth)
        f = object.__new__(H5File)
        f.buf = buf
        got = f._v2btree_records(0)
        assert got == expected
        # deep trees actually have many records (sanity that the
        # fixture exercises recursion, not a trivial tree)
        if depth >= 2:
            assert len(got) > 20

    def test_depth2_hand_computed_literal_offsets(self):
        """A depth-2 tree serialized at HAND-COMPUTED literal byte
        offsets, sharing NO formulas with the implementation or the
        ``_build`` helper (ADVICE r8: a shared misreading of the spec's
        child-pointer widths would pass the builder-parity test).

        Spec arithmetic done by hand for node_size=64, rec_size=8
        (overhead = 4 sig + 1 ver + 1 type + 4 checksum = 10):
          leaf capacity            = (64-10)//8            = 6
          depth-1 ptr width        = 8 addr + 1 nrec       = 9
            (nrec field = min bytes for leaf cap 6 → 1)
          depth-1 capacity         = (64-10-9)//(8+9)      = 2
          depth-1 cum subtree max  = 6*(2+1)+2             = 20
          depth-2 ptr width        = 8 addr + 1 nrec + 1 tot = 10
            (tot field = min bytes for cum max 20 → 1)
        So inside the depth-2 root: records start at node+6; the child
        pointers start at node+6+nrec*8; each pointer is 10 bytes.
        Inside a depth-1 node the pointers are 9 bytes (no total)."""
        from w4h_etl_container_spark.sources.hdf5 import H5File

        buf = bytearray(480)
        # --- header @0: sig ver type | node_size u32 @6 | rec u16 @10
        # | depth u16 @12 | split merge @14 | root addr u64 @16 | root
        # nrec u16 @24
        buf[0:6] = b"BTHD" + bytes([0, 5])
        struct.pack_into("<I", buf, 6, 64)
        struct.pack_into("<HH", buf, 10, 8, 2)
        buf[14], buf[15] = 100, 40
        struct.pack_into("<QH", buf, 16, 32, 1)
        # node addresses (literals): root@32, A@96, B@160, leaves
        # L0@224 L1@288 L2@352 L3@416. In-order record values:
        # L0=0, A.rec=1, L1=2, root.rec=3, L2=4, B.rec=5, L3=6.
        # --- root internal (depth 2, nrec=1) @32
        buf[32:38] = b"BTIN" + bytes([0, 5])
        struct.pack_into("<Q", buf, 38, 3)          # record @ node+6
        struct.pack_into("<Q", buf, 46, 96)         # child A addr @ node+14
        buf[54] = 1                                 # A direct nrec (1 byte)
        buf[55] = 3                                 # A subtree total (1 byte)
        struct.pack_into("<Q", buf, 56, 160)        # child B addr @ node+24
        buf[64] = 1
        buf[65] = 3
        # --- depth-1 internals (nrec=1, 9-byte pointers) @96 and @160
        for base, rec, l_left, l_right in ((96, 1, 224, 288), (160, 5, 352, 416)):
            buf[base : base + 6] = b"BTIN" + bytes([0, 5])
            struct.pack_into("<Q", buf, base + 6, rec)
            struct.pack_into("<Q", buf, base + 14, l_left)
            buf[base + 22] = 1                      # leaf direct nrec
            struct.pack_into("<Q", buf, base + 23, l_right)
            buf[base + 31] = 1
        # --- leaves (nrec=1) with their in-order values
        for base, val in ((224, 0), (288, 2), (352, 4), (416, 6)):
            buf[base : base + 6] = b"BTLF" + bytes([0, 5])
            struct.pack_into("<Q", buf, base + 6, val)

        f = object.__new__(H5File)
        f.buf = bytes(buf)
        got = f._v2btree_records(0)
        assert got == [struct.pack("<Q", v) for v in range(7)]


class TestFilterMessageV2:
    """Version-2 filter-pipeline messages omit the Name Length field for
    builtin filters (id < 256) — a layout the golden artifact (contiguous)
    and the crafted fixture (v1 message) never exercise."""

    def _filters_of(self, payload: bytes):
        from w4h_etl_container_spark.sources.hdf5 import H5File

        f = object.__new__(H5File)
        f.buf = payload
        return f._filters(0)

    def test_v2_builtin_filters_have_no_name_field(self):
        body = bytes([2, 2])  # version 2, two filters
        body += struct.pack("<HHH", 2, 0, 1) + struct.pack("<I", 4)  # shuffle(4)
        body += struct.pack("<HHH", 1, 0, 1) + struct.pack("<I", 6)  # deflate(6)
        assert self._filters_of(body) == [(2, (4,)), (1, (6,))]

    def test_v2_custom_filter_keeps_name_field(self):
        body = bytes([2, 1])
        body += struct.pack("<HHHH", 300, 4, 0, 2) + b"myf\0" + struct.pack("<II", 7, 9)
        assert self._filters_of(body) == [(300, (7, 9))]

    def test_v1_message_unchanged(self):
        body = bytes([1, 1]) + b"\0" * 6
        body += struct.pack("<HHHH", 1, 0, 0, 1) + struct.pack("<I", 6) + b"\0" * 4
        assert self._filters_of(body) == [(1, (6,))]


class TestSquareGridAxisPairing:
    """A square (lat, lon) grid must still pair each axis with a DISTINCT
    scale (file order = netCDF definition order); truly ambiguous scale
    sets raise instead of silently mislabeling coordinates."""

    class _FakeDS:
        def __init__(self, name, arr, attrs):
            self.name, self._arr, self.attrs = name, arr, attrs
            self.shape = arr.shape
            self.dtype = arr.dtype

        def read(self):
            return self._arr

    def _patch(self, monkeypatch, sets):
        import w4h_etl_container_spark.sources.hdf5 as hdf5mod

        monkeypatch.setattr(hdf5mod, "read_hdf5", lambda path: sets)

    def test_square_grid_pairs_both_axes(self, monkeypatch):
        from w4h_etl_container_spark.sources.hdf5 import mask_nc4_to_long

        scale = {"CLASS": "DIMENSION_SCALE"}
        sets = {
            "lat": self._FakeDS("lat", np.array([10.0, 20.0, 30.0], "f4"), scale),
            "lon": self._FakeDS("lon", np.array([1.0, 2.0, 3.0], "f4"), scale),
            "m": self._FakeDS("m", np.arange(9, dtype="i1").reshape(3, 3), {}),
        }
        self._patch(monkeypatch, sets)
        df = mask_nc4_to_long("ignored.nc")
        assert list(df.columns) == ["lat", "lon", "m"]
        assert len(df) == 9
        assert sorted(df["lat"].unique()) == [10.0, 20.0, 30.0]
        assert sorted(df["lon"].unique()) == [1.0, 2.0, 3.0]
        # axis-major order: lat varies slowest
        assert df["lat"].iloc[0] == 10.0 and df["lon"].iloc[1] == 2.0

    def test_truly_ambiguous_scales_raise(self, monkeypatch):
        from w4h_etl_container_spark.sources.hdf5 import mask_nc4_to_long

        scale = {"CLASS": "DIMENSION_SCALE"}
        sets = {
            "a": self._FakeDS("a", np.zeros(3, "f4"), scale),
            "b": self._FakeDS("b", np.zeros(3, "f4"), scale),
            "c": self._FakeDS("c", np.zeros(3, "f4"), scale),
            "m": self._FakeDS("m", np.zeros((3, 3), "i1"), {}),
        }
        self._patch(monkeypatch, sets)
        with pytest.raises(ValueError, match="ambiguous dimension scales"):
            mask_nc4_to_long("ignored.nc")
