"""Independent Torch7 (.t7) stream serializer for golden-fixture tests.

Written directly from the PUBLIC serialization grammar of torch7's
File.lua/File.c `writeObject` (the format `torch.save` emits — the
reference checkpoints it at /root/reference/src/model/model.lua:724),
using only `struct.pack`.  It deliberately shares NO serialization code
with `aocr.t7` (only the passive TorchObject data holder is reused for
tree construction): its purpose is to break the reader<->writer
circularity called out in VERDICT r2 — bytes produced here exercise
`aocr.t7.load` from an independent origin.

It also produces stream variants the aocr writer structurally CANNOT
produce, all of which occur in wild .t7 files:

- legacy versionless class records (no 'V <n>' tag — pre-2015 torch)
- torch.CudaTensor / torch.CudaStorage records (GPU checkpoints; the
  reference casts them to double on load, model.lua:55-59)
- getParameters-style parameter sharing: every weight/bias of a module
  group stored as a strided VIEW into ONE flat group storage with
  non-trivial storageOffsets (this is exactly how the reference's
  flattened groups serialize, model.lua:161-168)
- function records (TYPE_FUNCTION / TYPE_RECUR_FUNCTION / legacy 7)
  with dumped-bytecode payloads and upvalue tables
- 4-byte-long streams (C `long` on 32-bit builds: sizes/strides/offsets
  and storage lengths shrink to int32)

Grammar implemented (all little-endian; int=int32, long=int64 or int32
per `long_size`, number=float64):

    object  := typeid payload
    nil     := <0>
    number  := <1> f64
    string  := <2> int(len) bytes
    table   := <3> int(heap-idx) [int(npairs) (object object)*]
    torch   := <4> int(heap-idx) [str('V <n>') str(class) body
                                  | str(class) body]        -- legacy
    boolean := <5> int(0|1)
    function:= <6|7|8> int(heap-idx) [int(len) bytes object(upvalues)]
    tensor body  := int(ndim) long[ndim](size) long[ndim](stride)
                    long(storageOffset, 1-based) object(storage|nil)
    storage body := long(n) raw elementwise bytes
    other class  := object (the instance-field table)

Heap indices deduplicate shared references: the second occurrence of the
same table/torch-object/function writes only its index.
"""

from __future__ import annotations

import struct
from typing import Any, BinaryIO, Dict, List, Optional, Sequence

import numpy as np

from aocr.t7 import TorchObject  # data holder only; no serializer reuse

TYPE_NIL = 0
TYPE_NUMBER = 1
TYPE_STRING = 2
TYPE_TABLE = 3
TYPE_TORCH = 4
TYPE_BOOLEAN = 5
TYPE_FUNCTION = 6
TYPE_LEGACY_RECUR_FUNCTION = 7
TYPE_RECUR_FUNCTION = 8

_PREFIX_BY_DTYPE = {
    np.dtype(np.float64): "Double",
    np.dtype(np.float32): "Float",
    np.dtype(np.int64): "Long",
    np.dtype(np.int32): "Int",
    np.dtype(np.int16): "Short",
    np.dtype(np.int8): "Char",
    np.dtype(np.uint8): "Byte",
}


class Storage:
    """A torch.<T>Storage heap object that may back several tensor views
    (what getParameters produces for each flattened module group)."""

    def __init__(self, data: np.ndarray, prefix: Optional[str] = None):
        self.data = np.ascontiguousarray(data).reshape(-1)
        self.prefix = prefix or _PREFIX_BY_DTYPE[self.data.dtype]


class View:
    """A tensor view: shape/strides/offset into a shared Storage.
    offset is 0-based here; the stream stores it 1-based."""

    def __init__(self, storage: Storage, shape: Sequence[int],
                 strides: Sequence[int], offset: int,
                 prefix: Optional[str] = None):
        self.storage = storage
        self.shape = tuple(shape)
        self.strides = tuple(strides)
        self.offset = offset
        self.prefix = prefix or storage.prefix


class Function:
    """A serialized Lua function record (bytecode is opaque to readers)."""

    def __init__(self, dumped: bytes = b"\x1bLua-bytecode",
                 upvalues: Any = None, typeid: int = TYPE_RECUR_FUNCTION):
        assert typeid in (TYPE_FUNCTION, TYPE_LEGACY_RECUR_FUNCTION,
                          TYPE_RECUR_FUNCTION)
        self.dumped = dumped
        self.upvalues = upvalues
        self.typeid = typeid


class GoldenWriter:
    def __init__(self, f: BinaryIO, long_size: int = 8,
                 legacy_classes: bool = False, cuda: bool = False):
        assert long_size in (4, 8)
        self.f = f
        self.long_size = long_size
        self.long_fmt = "<q" if long_size == 8 else "<i"
        self.legacy_classes = legacy_classes  # omit the 'V 1' version tag
        self.cuda = cuda  # float tensors/storages as torch.Cuda*
        self.heap: Dict[int, int] = {}
        self.next_idx = 1
        # the heap memo keys on id(); temporaries (e.g. the Storage/View
        # wrapped around a plain ndarray) must stay alive for the whole
        # write or a recycled id() would alias two distinct objects
        self._keepalive: List[Any] = []

    # -------------------------------------------------- low-level emitters

    def _int(self, v: int) -> None:
        self.f.write(struct.pack("<i", v))

    def _long(self, v: int) -> None:
        self.f.write(struct.pack(self.long_fmt, v))

    def _str(self, s) -> None:
        b = s.encode() if isinstance(s, str) else bytes(s)
        self._int(len(b))
        self.f.write(b)

    def _heap_hit(self, obj: Any) -> bool:
        """Write the heap index; True if the object was already emitted
        (caller must then emit nothing further)."""
        if id(obj) in self.heap:
            self._int(self.heap[id(obj)])
            return True
        self.heap[id(obj)] = self.next_idx
        self._keepalive.append(obj)
        self._int(self.next_idx)
        self.next_idx += 1
        return False

    def _classname(self, name: str) -> None:
        if not self.legacy_classes:
            self._str("V 1")
        self._str(name)

    # ------------------------------------------------------------ objects

    def emit(self, obj: Any) -> None:
        if obj is None:
            self._int(TYPE_NIL)
        elif isinstance(obj, bool):
            self._int(TYPE_BOOLEAN)
            self._int(1 if obj else 0)
        elif isinstance(obj, (int, float)):
            self._int(TYPE_NUMBER)
            self.f.write(struct.pack("<d", float(obj)))
        elif isinstance(obj, (str, bytes)):
            self._int(TYPE_STRING)
            self._str(obj)
        elif isinstance(obj, np.ndarray):
            st = Storage(obj)
            shape = obj.shape
            strides = []
            acc = 1
            for s in reversed(shape):
                strides.append(acc)
                acc *= s
            self.emit(View(st, shape, tuple(reversed(strides)), 0))
        elif isinstance(obj, View):
            self._emit_tensor(obj)
        elif isinstance(obj, Storage):
            self._emit_storage(obj)
        elif isinstance(obj, Function):
            self._int(obj.typeid)
            if not self._heap_hit(obj):
                self._int(len(obj.dumped))
                self.f.write(obj.dumped)
                self.emit(obj.upvalues)
        elif isinstance(obj, (list, tuple)):
            self._int(TYPE_TABLE)
            if not self._heap_hit(obj):
                self._int(len(obj))
                for i, v in enumerate(obj):
                    self.emit(float(i + 1))
                    self.emit(v)
        elif isinstance(obj, dict):
            self._int(TYPE_TABLE)
            if not self._heap_hit(obj):
                self._int(len(obj))
                for k, v in obj.items():
                    self.emit(k)
                    self.emit(v)
        elif isinstance(obj, TorchObject):
            self._int(TYPE_TORCH)
            if not self._heap_hit(obj):
                self._classname(obj.torch_typename)
                self.emit(dict(obj.fields))
        else:
            raise TypeError(f"golden writer cannot emit {type(obj)}")

    def _tensor_class(self, prefix: str) -> str:
        if self.cuda and prefix == "Float":
            return "torch.CudaTensor"
        return f"torch.{prefix}Tensor"

    def _storage_class(self, prefix: str) -> str:
        if self.cuda and prefix == "Float":
            return "torch.CudaStorage"
        return f"torch.{prefix}Storage"

    def _emit_tensor(self, v: View) -> None:
        self._int(TYPE_TORCH)
        if self._heap_hit(v):
            return
        self._classname(self._tensor_class(v.prefix))
        self._int(len(v.shape))
        for s in v.shape:
            self._long(s)
        for s in v.strides:
            self._long(s)
        self._long(v.offset + 1)  # 1-based storageOffset
        self.emit(v.storage)

    def _emit_storage(self, st: Storage) -> None:
        self._int(TYPE_TORCH)
        if self._heap_hit(st):
            return
        self._classname(self._storage_class(st.prefix))
        self._long(st.data.size)
        if st.prefix == "Long" and self.long_size == 4:
            # torch7 File.c stores LongStorage elements as C `long` —
            # 4 bytes on the 32-bit builds a long_size=4 stream models.
            self.f.write(st.data.astype("<i4").tobytes())
        else:
            self.f.write(st.data.tobytes())


def save(path: str, obj: Any, **kw) -> None:
    with open(path, "wb") as f:
        GoldenWriter(f, **kw).emit(obj)


# --------------------------------------------------------------- fixtures


def flatten_group_params(objs: List[TorchObject],
                         dtype=np.float32) -> Storage:
    """Replace every weight/bias ndarray in a module tree with a View into
    ONE flat group Storage — byte-level what the reference's
    getParameters-flattened groups look like on disk
    (model.lua:161-168: one storage per group, modules hold views)."""
    leaves = []  # (holder dict, key, array)

    def walk(o):
        if isinstance(o, TorchObject):
            walk(o.fields)
        elif isinstance(o, dict):
            for k, v in o.items():
                if isinstance(v, np.ndarray) and k in ("weight", "bias"):
                    leaves.append((o, k, np.asarray(v, dtype)))
                else:
                    walk(v)
        elif isinstance(o, (list, tuple)):
            for v in o:
                walk(v)

    for o in objs:
        walk(o)
    total = sum(a.size for _, _, a in leaves)
    flat = np.empty((total,), dtype)
    storage = Storage(flat)
    off = 0
    for holder, key, arr in leaves:
        flat[off:off + arr.size] = arr.reshape(-1)
        strides = []
        acc = 1
        for s in reversed(arr.shape):
            strides.append(acc)
            acc *= s
        holder[key] = View(storage, arr.shape, tuple(reversed(strides)), off)
        off += arr.size
    return storage
