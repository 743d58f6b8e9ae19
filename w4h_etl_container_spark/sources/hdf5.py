"""SRC-3 extension — NetCDF-4 / HDF5 ingestion, zero native dependencies.

The one reference artifact the CDF-1/2 codec (``sources/netcdf3.py``)
cannot read is the near-land mask — reference ``main.py:281`` opens
``near_land_complete_globe.nc`` with ``xr.open_dataarray`` and zips its
rows against the forecast grid. That file is NetCDF-4, i.e. an HDF5
container. No h5py/netCDF4/xarray exist in this container, so this
module implements the subset of the PUBLIC "HDF5 File Format
Specification Version 3.0" (The HDF Group) that NetCDF-4 files written
by libhdf5 1.8+ actually use:

* superblock v0/v1 (symbol-table root) and v2/v3 (root header address);
* object headers v1 (unsigned, 8-byte-aligned messages) and v2
  (``OHDR``/``OCHK`` signed blocks, optional creation-order fields);
* all three group encodings — old-style symbol tables (v1 B-tree over
  ``SNOD`` nodes + local heap), new-style compact Link messages, and
  dense groups (Link messages in a fractal heap indexed by a v2
  B-tree on name hash — the layout netCDF-4 emits past its
  compact-link threshold), with v2 B-tree traversal at ANY depth
  (per-level child-pointer widths from the spec's capacity formulas);
* dataspace v1/v2, datatype classes 0/1/3 (fixed-point, IEEE float,
  fixed-length string), attribute messages v1/v3;
* data layout v3: compact, contiguous, and chunked behind a v1 B-tree
  chunk index, with the deflate (zlib), shuffle, and fletcher32
  filters (checksum stripped, not verified) and fill-value for chunks
  the index doesn't cover.

Datasets come back as numpy arrays; ``mask_nc4_to_long`` reshapes the
(lat, lon) mask grid into the engine's long-form frame — the SAME
boundary ``netcdf3.grid_nc_to_long`` uses — so the mask lands as the
broadcast dimension of the JOIN-3 near-land join. At scale this stays a
per-file map (one .nc → one parquet write), parallelized by file;
HDF5's internal chunking never leaks into the engine's partitioning.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

_UNDEF = 0xFFFFFFFFFFFFFFFF
_SIG = b"\x89HDF\r\n\x1a\n"

# object-header message types used below (spec IV.A.2)
_M_DATASPACE = 0x01
_M_LINKINFO = 0x02
_M_DATATYPE = 0x03
_M_FILLVALUE = 0x05
_M_LINK = 0x06
_M_LAYOUT = 0x08
_M_FILTERS = 0x0B
_M_ATTRIBUTE = 0x0C
_M_CONTINUATION = 0x10
_M_SYMBOLTABLE = 0x11


@dataclass
class H5Dataset:
    """One HDF5 dataset: lazy payload, parsed metadata."""

    name: str
    shape: tuple[int, ...]
    dtype: np.dtype
    attrs: dict[str, object]
    _file: "H5File"
    _layout: tuple
    _filters: list[tuple[int, tuple[int, ...]]]
    _fill: bytes | None

    def read(self) -> np.ndarray:
        return self._file._read_dataset(self)


@dataclass
class H5File:
    """Minimal HDF5 reader (see module docstring for the covered
    subset). ``datasets`` maps '/'-joined paths to ``H5Dataset``."""

    path: str
    buf: bytes = field(repr=False, default=b"")
    datasets: dict[str, H5Dataset] = field(default_factory=dict)

    def __post_init__(self):
        with open(self.path, "rb") as f:
            self.buf = f.read()
        if self.buf[: len(_SIG)] != _SIG:
            raise ValueError(f"{self.path}: not an HDF5 file")
        ver = self.buf[8]
        if ver in (0, 1):
            # v0/v1: sizes at 13/14; v1 inserts 4 bytes (indexed-storage
            # node k + reserved) before the address block
            if self.buf[13] != 8 or self.buf[14] != 8:
                raise NotImplementedError("only 8-byte offsets/lengths supported")
            base = 24 + (4 if ver == 1 else 0)
            # symbol table entry: link name offset(8) + header address(8)
            root = struct.unpack_from("<Q", self.buf, base + 32 + 8)[0]
        elif ver in (2, 3):
            if self.buf[9] != 8 or self.buf[10] != 8:
                raise NotImplementedError("only 8-byte offsets/lengths supported")
            root = struct.unpack_from("<Q", self.buf, 12 + 24)[0]
        else:
            raise NotImplementedError(f"superblock version {ver}")
        self._seen_groups: set[int] = set()
        self._walk_group(root, "")

    # -- object headers -----------------------------------------------------
    def _messages(self, off: int) -> list[tuple[int, int, int]]:
        """All (type, size, body-offset) messages of the object header at
        ``off``, continuations followed, v1 and v2 both handled."""
        buf = self.buf
        msgs: list[tuple[int, int, int]] = []
        if buf[off : off + 4] == b"OHDR":
            flags = buf[off + 5]
            pos = off + 6
            if flags & 0x20:
                pos += 16  # access/mod/change/birth times
            if flags & 0x10:
                pos += 4  # attribute phase-change bounds
            socb = 1 << (flags & 0x3)
            soc = int.from_bytes(buf[pos : pos + socb], "little")
            pos += socb
            track = bool(flags & 0x04)
            # Chunk 0's 'Size of Chunk 0' covers the message region only —
            # the trailing 4-byte checksum sits OUTSIDE it (verified on the
            # reference artifact: a <4-byte gap at chunk end is a legal
            # tail, not a dropped message). OCHK continuation lengths DO
            # include their signature and checksum, so those block ends
            # are trimmed by 8 when enqueued; the loop bound is then
            # uniformly "message header fits before block end".
            blocks = [(pos, pos + soc)]
            while blocks:
                p, e = blocks.pop(0)
                while p + 4 <= e:
                    mtype = buf[p]
                    msize = struct.unpack_from("<H", buf, p + 1)[0]
                    mflags = buf[p + 3]
                    body = p + 4 + (2 if track else 0)
                    if mtype == _M_CONTINUATION:
                        caddr, clen = struct.unpack_from("<QQ", buf, body)
                        if buf[caddr : caddr + 4] != b"OCHK":
                            raise ValueError("bad OCHK continuation block")
                        blocks.append((caddr + 4, caddr + clen - 4))
                    else:
                        if mflags & 0x02 and mtype in (
                            _M_DATASPACE, _M_DATATYPE, _M_FILLVALUE, _M_LAYOUT
                        ):
                            raise NotImplementedError(
                                f"shared message (type 0x{mtype:02x}) not supported"
                            )
                        msgs.append((mtype, msize, body))
                    p = body + msize
        else:
            nmsg = struct.unpack_from("<H", buf, off + 2)[0]
            hsize = struct.unpack_from("<I", buf, off + 8)[0]
            pos = off + 16  # 12-byte prefix padded to 8-byte alignment
            blocks = [(pos, pos + hsize)]
            while blocks and len(msgs) < nmsg:
                p, e = blocks.pop(0)
                while p + 8 <= e and len(msgs) < nmsg:
                    mtype, msize = struct.unpack_from("<HH", buf, p)
                    mflags = buf[p + 4]
                    body = p + 8
                    if mtype == _M_CONTINUATION:
                        caddr, clen = struct.unpack_from("<QQ", buf, body)
                        blocks.append((caddr, caddr + clen))  # v1: no signature
                    else:
                        if mflags & 0x02 and mtype in (
                            _M_DATASPACE, _M_DATATYPE, _M_FILLVALUE, _M_LAYOUT
                        ):
                            # the body is a shared-message POINTER, not the
                            # message — parsing it as inline data would
                            # yield garbage shapes/dtypes silently
                            raise NotImplementedError(
                                f"shared message (type 0x{mtype:02x}) not supported"
                            )
                        msgs.append((mtype, msize, body))
                    p = body + msize
        return msgs

    # -- groups -------------------------------------------------------------
    def _walk_group(self, header: int, prefix: str) -> None:
        # hard-link cycles are legal HDF5 (absent in netCDF-4 output);
        # without this guard they'd recurse to RecursionError
        if header in self._seen_groups:
            raise ValueError(
                f"{self.path}: hard-link cycle at object header 0x{header:x}"
            )
        self._seen_groups.add(header)
        msgs = self._messages(header)
        types = {t for t, _, _ in msgs}
        links: list[tuple[str, int]] = []
        if _M_SYMBOLTABLE in types:
            for t, _, body in msgs:
                if t == _M_SYMBOLTABLE:
                    btree, heap = struct.unpack_from("<QQ", self.buf, body)
                    links += self._symbol_links(btree, heap)
        else:
            for t, _, body in msgs:
                if t == _M_LINK:
                    links.append(self._parse_link(body))
                elif t == _M_LINKINFO:
                    # dense groups keep link messages in a fractal heap,
                    # indexed by a v2 B-tree on name hash — netCDF-4
                    # switches to this layout past the compact-link
                    # threshold (8 links by default)
                    p = body + 2  # version, flags
                    if self.buf[body + 1] & 0x01:
                        p += 8  # max creation index
                    fheap, name_bt = struct.unpack_from("<QQ", self.buf, p)
                    if fheap != _UNDEF:
                        links += self._dense_links(fheap, name_bt)
        for name, addr in links:
            child = self._messages(addr)
            ctypes = {t for t, _, _ in child}
            path = f"{prefix}/{name}" if prefix else name
            if _M_DATASPACE in ctypes and _M_LAYOUT in ctypes:
                self.datasets[path] = self._parse_dataset(path, child)
            else:
                self._walk_group(addr, path)

    def _parse_link(self, body: int) -> tuple[str, int]:
        buf = self.buf
        lflags = buf[body + 1]
        p = body + 2
        ltype = 0
        if lflags & 0x08:
            ltype = buf[p]
            p += 1
        if lflags & 0x04:
            p += 8  # creation order
        if lflags & 0x10:
            p += 1  # charset
        lsz = 1 << (lflags & 0x3)
        nlen = int.from_bytes(buf[p : p + lsz], "little")
        p += lsz
        name = buf[p : p + nlen].decode()
        p += nlen
        if ltype != 0:
            raise NotImplementedError(f"link type {ltype} (soft/external)")
        return name, struct.unpack_from("<Q", buf, p)[0]

    # -- dense groups: fractal heap + v2 B-tree (spec III.G / III.A.2) -------
    def _dense_links(self, fheap: int, name_bt: int) -> list[tuple[str, int]]:
        """Enumerate a dense group's links: every record of the name-index
        v2 B-tree (type 5: 4-byte name hash + fractal-heap ID) resolves
        through the heap's doubling table to a stored Link message, parsed
        with the same ``_parse_link`` the compact path uses. Lookup order
        is hash order — irrelevant here, enumeration only."""
        heap = _FractalHeap(self.buf, fheap)
        out: list[tuple[str, int]] = []
        for rec in self._v2btree_records(name_bt):
            out.append(self._parse_link(heap.object_file_offset(rec[4:])))
        return out

    def _v2btree_records(self, addr: int) -> list[bytes]:
        """All records of a v2 B-tree, in tree order, at ANY depth
        (round 8 — the former one-internal-level limit is lifted; a
        netCDF-4 file never needs more than depth 1 in practice, but a
        >3k-variable pathological file no longer refuses).

        Child-pointer field widths vary per level (spec III.A.2): an
        internal node's pointer to a depth-(d−1) child carries the
        child's DIRECT record count in the minimum bytes for that
        level's node capacity, plus — only when the child is itself
        internal — the subtree's cumulative record total in the bytes
        for the cumulative capacity. Both capacity tables derive from
        node_size/rec_size exactly as libhdf5 computes them
        (n·rec + (n+1)·ptr ≤ node_size − 10), so the reader walks the
        same byte layout the writer emitted. Checksums are not verified
        (same policy as fletcher32)."""
        buf = self.buf
        if buf[addr : addr + 4] != b"BTHD":
            raise ValueError("bad v2 B-tree header")
        node_size = struct.unpack_from("<I", buf, addr + 6)[0]
        rec_size, depth = struct.unpack_from("<HH", buf, addr + 10)
        root, root_nrec = struct.unpack_from("<QH", buf, addr + 16)

        def bytes_for(v: int) -> int:
            return max(1, (v.bit_length() + 7) // 8)

        # per-depth node capacity (max direct records) and cumulative
        # subtree capacity — these fix every child-pointer field width
        max_nrec = {0: (node_size - 10) // rec_size}
        cum_max = {0: max_nrec[0]}
        for d in range(1, depth + 1):
            ptr = 8 + bytes_for(max_nrec[d - 1]) + (
                bytes_for(cum_max[d - 1]) if d > 1 else 0
            )
            cap = (node_size - 10 - ptr) // (rec_size + ptr)
            if cap < 1:
                raise ValueError("v2 B-tree node size too small for its depth")
            max_nrec[d] = cap
            cum_max[d] = cum_max[d - 1] * (cap + 1) + cap

        def leaf(node: int, nrec: int) -> list[bytes]:
            if buf[node : node + 4] != b"BTLF":
                raise ValueError("bad v2 B-tree leaf")
            p = node + 6
            return [bytes(buf[p + i * rec_size : p + (i + 1) * rec_size]) for i in range(nrec)]

        def visit(node: int, nrec: int, d: int) -> list[bytes]:
            if d == 0:
                return leaf(node, nrec)
            if buf[node : node + 4] != b"BTIN":
                raise ValueError("bad v2 B-tree internal node")
            sz_nrec = bytes_for(max_nrec[d - 1])
            sz_tot = bytes_for(cum_max[d - 1]) if d > 1 else 0
            p = node + 6
            ptr_at = p + nrec * rec_size
            out: list[bytes] = []
            for i in range(nrec + 1):
                caddr = struct.unpack_from("<Q", buf, ptr_at)[0]
                cnrec = int.from_bytes(
                    buf[ptr_at + 8 : ptr_at + 8 + sz_nrec], "little"
                )
                ptr_at += 8 + sz_nrec + sz_tot
                out.extend(visit(caddr, cnrec, d - 1))
                if i < nrec:
                    out.append(bytes(buf[p + i * rec_size : p + (i + 1) * rec_size]))
            return out

        return visit(root, root_nrec, depth)

    def _symbol_links(self, btree: int, heap: int) -> list[tuple[str, int]]:
        """Old-style group: v1 B-tree (node type 0) over SNOD symbol
        nodes, names in the local heap."""
        buf = self.buf
        if buf[heap : heap + 4] != b"HEAP":
            raise ValueError("bad local heap")
        heap_data = struct.unpack_from("<Q", buf, heap + 24)[0]

        def heap_str(o: int) -> str:
            s = heap_data + o
            return buf[s : buf.index(b"\0", s)].decode()

        out: list[tuple[str, int]] = []

        def visit(node: int) -> None:
            if buf[node : node + 4] == b"SNOD":
                nsym = struct.unpack_from("<H", buf, node + 6)[0]
                for i in range(nsym):
                    e = node + 8 + 40 * i
                    name_off, header = struct.unpack_from("<QQ", buf, e)
                    out.append((heap_str(name_off), header))
                return
            if buf[node : node + 4] != b"TREE":
                raise ValueError("bad group B-tree node")
            level = buf[node + 5]
            n = struct.unpack_from("<H", buf, node + 6)[0]
            # keys are heap offsets (8 bytes); children 8 bytes, interleaved
            p = node + 8 + 16 + 8  # past sig/meta, siblings, key 0
            for _ in range(n):
                child = struct.unpack_from("<Q", buf, p)[0]
                visit(child)
                p += 16  # child + next key
            del level  # both levels recurse identically via signatures

        visit(btree)
        return out

    # -- metadata messages ---------------------------------------------------
    def _dataspace(self, body: int) -> tuple[int, ...]:
        buf = self.buf
        ver, rank = buf[body], buf[body + 1]
        p = body + (8 if ver == 1 else 4)
        return tuple(struct.unpack_from("<Q", buf, p + 8 * i)[0] for i in range(rank))

    def _datatype(self, body: int) -> np.dtype:
        buf = self.buf
        cls = buf[body] & 0x0F
        b0 = buf[body + 1]
        size = struct.unpack_from("<I", buf, body + 4)[0]
        order = ">" if (b0 & 0x01) else "<"
        if cls == 0:  # fixed-point
            sign = "i" if (b0 & 0x08) else "u"
            return np.dtype(f"{order}{sign}{size}")
        if cls == 1:  # floating-point (IEEE assumed; netCDF emits only IEEE)
            return np.dtype(f"{order}f{size}")
        if cls == 3:  # fixed-length string
            return np.dtype(f"S{size}")
        raise NotImplementedError(f"datatype class {cls}")

    def _attribute(self, body: int) -> tuple[str, object]:
        buf = self.buf
        ver = buf[body]
        nsz, dtsz, dssz = struct.unpack_from("<HHH", buf, body + 2)
        if ver == 1:
            pad = lambda n: (n + 7) & ~7  # noqa: E731
            p = body + 8
            name = buf[p : p + nsz].split(b"\0")[0].decode()
            p += pad(nsz)
            dt_off, p = p, p + pad(dtsz)
            ds_off, p = p, p + pad(dssz)
        elif ver in (2, 3):
            p = body + 8 + (1 if ver == 3 else 0)
            name = buf[p : p + nsz].split(b"\0")[0].decode()
            p += nsz
            # v2/v3 flags (bit 0: datatype shared, bit 1: dataspace
            # shared): the datatype/dataspace regions then hold shared-
            # message POINTERS, not inline definitions — parsing them
            # inline would silently yield a garbled value (e.g. a broken
            # CLASS attr breaks dimension-scale detection). Mirror the
            # object-header shared-message guard: value elided.
            if buf[body + 1] & 0x03:
                return name, None
            dt_off, p = p, p + dtsz
            ds_off, p = p, p + dssz
        else:
            raise NotImplementedError(f"attribute message v{ver}")
        try:
            dt = self._datatype(dt_off)
            shape = self._dataspace(ds_off)
        except NotImplementedError:
            return name, None  # vlen/reference attrs: present, value elided
        count = int(np.prod(shape)) if shape else 1
        raw = buf[p : p + count * dt.itemsize]
        if dt.kind == "S":
            return name, raw.split(b"\0")[0].decode(errors="replace")
        vals = np.frombuffer(raw, dtype=dt, count=count)
        return name, vals[0].item() if count == 1 else vals.tolist()

    def _parse_dataset(self, name: str, msgs) -> H5Dataset:
        buf = self.buf
        shape: tuple[int, ...] = ()
        dtype = np.dtype("u1")
        layout: tuple = ()
        filters: list[tuple[int, tuple[int, ...]]] = []
        fill: bytes | None = None
        attrs: dict[str, object] = {}
        for t, msize, body in msgs:
            if t == _M_DATASPACE:
                shape = self._dataspace(body)
            elif t == _M_DATATYPE:
                dtype = self._datatype(body)
            elif t == _M_LAYOUT:
                layout = self._layout(body)
            elif t == _M_FILTERS:
                filters = self._filters(body)
            elif t == _M_ATTRIBUTE:
                k, v = self._attribute(body)
                attrs[k] = v
            elif t == _M_FILLVALUE:
                fill = self._fillvalue(body)
        return H5Dataset(name, shape, dtype, attrs, self, layout, filters, fill)

    def _layout(self, body: int) -> tuple:
        buf = self.buf
        ver = buf[body]
        if ver != 3:
            raise NotImplementedError(f"data layout message v{ver}")
        cls = buf[body + 1]
        if cls == 0:  # compact: size(2) + raw data
            sz = struct.unpack_from("<H", buf, body + 2)[0]
            return ("compact", body + 4, sz)
        if cls == 1:  # contiguous: address(8) + size(8)
            addr, sz = struct.unpack_from("<QQ", buf, body + 2)
            return ("contiguous", addr, sz)
        if cls == 2:  # chunked: dimensionality(1), btree(8), dims u4 each
            nd = buf[body + 2]
            btree = struct.unpack_from("<Q", buf, body + 3)[0]
            dims = tuple(
                struct.unpack_from("<I", buf, body + 11 + 4 * i)[0] for i in range(nd)
            )
            return ("chunked", btree, dims)  # dims[-1] = element size
        raise NotImplementedError(f"layout class {cls}")

    def _filters(self, body: int) -> list[tuple[int, tuple[int, ...]]]:
        buf = self.buf
        ver, nf = buf[body], buf[body + 1]
        p = body + (8 if ver == 1 else 2)
        out = []
        for _ in range(nf):
            fid = struct.unpack_from("<H", buf, p)[0]
            if ver == 1 or fid >= 256:
                namelen, flags, nvals = struct.unpack_from("<HHH", buf, p + 2)
                p += 8
                p += (namelen + 7) & ~7 if ver == 1 else namelen
            else:
                # v2 builtin filters (id < 256) OMIT the Name Length
                # field entirely: id(2), flags(2), nvals(2), values
                flags, nvals = struct.unpack_from("<HH", buf, p + 2)
                p += 6
            vals = struct.unpack_from(f"<{nvals}I", buf, p)
            p += 4 * nvals
            if ver == 1 and nvals % 2:
                p += 4  # v1 pads client data to 8 bytes
            del flags
            out.append((fid, vals))
        return out

    def _fillvalue(self, body: int) -> bytes | None:
        buf = self.buf
        ver = buf[body]
        if ver in (1, 2):
            p = body + 4
            if ver == 1 or buf[body + 3] == 1:  # fill value defined
                sz = struct.unpack_from("<I", buf, p)[0]
                return bytes(buf[p + 4 : p + 4 + sz])
            return None
        flags = buf[body + 2]
        if flags & 0x20:  # v3: fill value defined
            sz = struct.unpack_from("<I", buf, body + 3)[0]
            return bytes(buf[body + 7 : body + 7 + sz])
        return None

    # -- payload -------------------------------------------------------------
    def _read_dataset(self, d: H5Dataset) -> np.ndarray:
        kind, a, b = d._layout
        count = int(np.prod(d.shape)) if d.shape else 1
        if kind in ("compact", "contiguous"):
            if kind == "contiguous" and a == _UNDEF:
                return self._fill_array(d, count)
            raw = self.buf[a : a + min(b, count * d.dtype.itemsize)]
            return (
                np.frombuffer(raw, dtype=d.dtype, count=count)
                .reshape(d.shape)
                .astype(d.dtype.newbyteorder("="), copy=False)
            )
        return self._read_chunked(d, a, b)

    def _fill_array(self, d: H5Dataset, count: int) -> np.ndarray:
        out = np.zeros(count, dtype=d.dtype.newbyteorder("="))
        if d._fill:
            out[:] = np.frombuffer(d._fill, dtype=d.dtype, count=1)[0]
        return out.reshape(d.shape)

    def _read_chunked(self, d: H5Dataset, btree: int, cdims: tuple) -> np.ndarray:
        buf = self.buf
        chunk_shape = cdims[:-1]  # last entry is the element size
        out = self._fill_array(d, int(np.prod(d.shape)) if d.shape else 1)
        ndk = len(cdims)  # key offsets: ndims + 1 (element-dim always 0)

        def visit(node: int) -> None:
            if buf[node : node + 4] != b"TREE":
                raise ValueError("bad chunk B-tree node")
            ntype, level = buf[node + 4], buf[node + 5]
            if ntype != 1:
                raise ValueError("expected chunk B-tree (type 1)")
            n = struct.unpack_from("<H", buf, node + 6)[0]
            p = node + 8 + 16  # past signature/meta + left/right siblings
            key_sz = 8 + 8 * ndk
            for _ in range(n):
                csize, _mask = struct.unpack_from("<II", buf, p)
                offs = struct.unpack_from(f"<{ndk}Q", buf, p + 8)
                child = struct.unpack_from("<Q", buf, p + key_sz)[0]
                if level > 0:
                    visit(child)
                else:
                    self._place_chunk(d, out, chunk_shape, offs[:-1], child, csize)
                p += key_sz + 8
        visit(btree)
        return out

    def _place_chunk(self, d, out, chunk_shape, offs, addr, csize) -> None:
        raw = bytes(self.buf[addr : addr + csize])
        for fid, vals in reversed(d._filters):
            if fid == 1:  # deflate
                raw = zlib.decompress(raw)
            elif fid == 2:  # shuffle: de-interleave byte planes
                w = vals[0] if vals else d.dtype.itemsize
                n = len(raw) // w
                raw = (
                    np.frombuffer(raw, dtype="u1")
                    .reshape(w, n)
                    .T.tobytes()
                )
            elif fid == 3:  # fletcher32: strip trailing checksum
                raw = raw[:-4]
            else:
                raise NotImplementedError(f"HDF5 filter id {fid}")
        chunk = np.frombuffer(raw, dtype=d.dtype).reshape(chunk_shape)
        chunk = chunk.astype(d.dtype.newbyteorder("="), copy=False)
        sel = tuple(
            slice(o, min(o + c, s)) for o, c, s in zip(offs, chunk_shape, d.shape)
        )
        trim = tuple(slice(0, sl.stop - sl.start) for sl in sel)
        out[sel] = chunk[trim]


class _FractalHeap:
    """Managed-object side of an HDF5 fractal heap (spec III.G) — the
    storage behind dense group links and dense attributes. Parses the
    FRHP header, walks the doubling table (direct root, or an indirect
    root of direct-block rows) into an ordered block map over the heap's
    linear address space, and resolves managed heap IDs to FILE offsets.
    Huge (v2-B-tree-backed) and tiny (ID-embedded) objects raise — link
    messages are far below the managed-object threshold. Filtered heaps
    (I/O filter length > 0) raise: netCDF-4 never compresses link heaps.

    The heap's linear space INCLUDES each direct block's header bytes
    (the block-offset field names the block's first header byte), so an
    object at heap offset ``o`` inside a block whose offset is ``b``
    lives at ``block_file_addr + (o - b)`` — one subtraction, no
    payload reassembly."""

    def __init__(self, buf: bytes, addr: int):
        if buf[addr : addr + 4] != b"FRHP":
            raise ValueError("bad fractal heap header")
        self.buf = buf
        (
            self.id_len,
            self.filter_len,
        ) = struct.unpack_from("<HH", buf, addr + 5)
        self.flags = buf[addr + 9]
        self.max_managed = struct.unpack_from("<I", buf, addr + 10)[0]
        if self.filter_len:
            raise NotImplementedError("filtered fractal heap not supported")
        (
            self.table_width,
            self.start_block,
            self.max_direct,
            self.max_heap_bits,
            _start_rows,
            self.root_addr,
            self.cur_rows,
        ) = struct.unpack_from("<HQQHHQH", buf, addr + 14 + 8 * 12)
        self.off_size = (self.max_heap_bits + 7) // 8
        self.len_size = max(1, (self.max_managed.bit_length() + 7) // 8)
        # header bytes at the start of every direct block (checksum
        # present only when flags bit 1 is set)
        self.db_header = 4 + 1 + 8 + self.off_size + (4 if self.flags & 0x02 else 0)
        # ordered (heap_offset, size, file_addr) spans
        self.blocks: list[tuple[int, int, int]] = []
        if self.cur_rows == 0:
            self._add_direct(self.root_addr, 0, self.start_block)
        else:
            self._walk_indirect(self.root_addr, self.cur_rows)

    def _row_size(self, row: int) -> int:
        # doubling table: rows 0 and 1 at the starting size, then ×2/row
        return self.start_block if row < 2 else self.start_block << (row - 1)

    def _add_direct(self, addr: int, heap_off: int, size: int) -> None:
        if self.buf[addr : addr + 4] != b"FHDB":
            raise ValueError("bad fractal heap direct block")
        self.blocks.append((heap_off, size, addr))

    def _walk_indirect(self, addr: int, nrows: int) -> None:
        buf = self.buf
        if buf[addr : addr + 4] != b"FHIB":
            raise ValueError("bad fractal heap indirect block")
        import math

        max_direct_rows = (
            int(math.log2(self.max_direct)) - int(math.log2(self.start_block)) + 2
        )
        p = addr + 4 + 1 + 8 + self.off_size
        heap_off = 0
        for row in range(nrows):
            size = self._row_size(row)
            for _ in range(self.table_width):
                child = struct.unpack_from("<Q", buf, p)[0]
                p += 8
                if row >= max_direct_rows:
                    raise NotImplementedError(
                        "nested indirect fractal heap blocks not supported"
                    )
                if child != _UNDEF:
                    self._add_direct(child, heap_off, size)
                heap_off += size

    def object_file_offset(self, heap_id: bytes) -> int:
        """FILE offset of a managed object from its heap ID."""
        b0 = heap_id[0]
        if (b0 >> 6) != 0:
            raise NotImplementedError(f"heap ID version {b0 >> 6}")
        idtype = (b0 >> 4) & 0x3
        if idtype != 0:
            raise NotImplementedError(
                f"non-managed fractal heap object (type {idtype})"
            )
        off = int.from_bytes(heap_id[1 : 1 + self.off_size], "little")
        for heap_off, size, addr in self.blocks:
            if heap_off <= off < heap_off + size:
                return addr + (off - heap_off)
        raise ValueError(f"heap offset {off} outside any direct block")


def read_hdf5(path: str) -> dict[str, H5Dataset]:
    """All datasets of an HDF5/NetCDF-4 file, keyed by '/'-joined path."""
    return H5File(path).datasets


def mask_nc4_to_long(path: str) -> pd.DataFrame:
    """The reference's mask ingest (``main.py:281``) re-expressed at this
    engine's boundary: NetCDF-4 (lat, lon) grid → long-form frame with
    one row per cell — ready for ``spark.createDataFrame`` + broadcast
    into the JOIN-3 near-land join.

    The data variable is the one 2-D dataset that is NOT a netCDF
    dimension scale (coordinate vars carry ``CLASS=DIMENSION_SCALE``);
    its axes pair with the scales whose lengths match, in storage order
    (lat before lon on a CF grid, as in the reference file). Each scale
    is consumed at most once, so a SQUARE grid still pairs both axes —
    in file order, the netCDF definition order (the unambiguous mapping
    lives in DIMENSION_LIST object references, outside this reader's
    scope); two leftover same-length scales for one axis raise."""
    sets = read_hdf5(path)
    coords = {
        n: d for n, d in sets.items() if d.attrs.get("CLASS") == "DIMENSION_SCALE"
    }
    grids = [d for n, d in sets.items() if n not in coords and len(d.shape) == 2]
    if len(grids) != 1:
        raise ValueError(f"{path}: expected exactly one 2-D data variable, got {len(grids)}")
    var = grids[0]
    axes = []
    used: set[str] = set()
    for i, axis_len in enumerate(var.shape):
        match = [
            n for n, c in coords.items() if c.shape == (axis_len,) and n not in used
        ]
        remaining_same = sum(1 for length in var.shape[i:] if length == axis_len)
        if not match:
            raise ValueError(f"{path}: no unused dimension scale of length {axis_len}")
        if len(match) > remaining_same:
            raise ValueError(
                f"{path}: ambiguous dimension scales {match} for axis length {axis_len}"
            )
        used.add(match[0])
        axes.append((match[0], coords[match[0]].read().astype(np.float64)))
    (aname, avals), (bname, bvals) = axes
    aa, bb = np.meshgrid(avals, bvals, indexing="ij")
    return pd.DataFrame(
        {
            aname: aa.ravel(),
            bname: bb.ravel(),
            var.name: var.read().ravel(),
        }
    )
