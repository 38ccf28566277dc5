// Native host-side batch packer for the serving engine.
//
// Role parity: the reference keeps its hot host path in Python
// (_prepare_inputs, /root/reference/vllm/worker/worker.py:128-237) and
// its native code on the device side (csrc/*.cu). Here the device side
// is Pallas/XLA, and the per-step host work — flattening sequences
// into padded int32 plan arrays (tokens, positions, KV slots, block
// tables, context lengths) — is the piece worth making native: the
// serving host is often a single core, and this runs every iteration.
//
// Plain CPython C API (no pybind11 in the image). The Python caller
// allocates the padded numpy arrays and passes writable buffers; this
// module only fills them, so there is no numpy C API dependency.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>

namespace {

struct I32Buffer {
  Py_buffer view{};
  int32_t* data = nullptr;
  Py_ssize_t len = 0;  // element count
  bool ok = false;
};

bool acquire_i32(PyObject* obj, I32Buffer* buf) {
  if (PyObject_GetBuffer(obj, &buf->view, PyBUF_WRITABLE | PyBUF_FORMAT) !=
      0) {
    return false;
  }
  if (buf->view.itemsize != 4) {
    PyBuffer_Release(&buf->view);
    PyErr_SetString(PyExc_TypeError, "expected an int32 buffer");
    return false;
  }
  buf->data = static_cast<int32_t*>(buf->view.buf);
  buf->len = buf->view.len / 4;
  buf->ok = true;
  return true;
}

void release(I32Buffer* bufs, int n) {
  for (int i = 0; i < n; i++) {
    if (bufs[i].ok) PyBuffer_Release(&bufs[i].view);
  }
}

// fill_decode(rows, tokens, positions, slots, tables, ctx,
//             block_size, pad_slot)
//
// rows: sequence of (last_token:int, length:int, table:sequence[int]).
// tokens/positions/slots/ctx: int32[B]; tables: int32[B*MB] (row-major)
// — all pre-filled with their padding values by the caller.
PyObject* fill_decode(PyObject*, PyObject* args) {
  PyObject *rows, *o_tokens, *o_positions, *o_slots, *o_tables, *o_ctx;
  long block_size, pad_slot;
  if (!PyArg_ParseTuple(args, "OOOOOOll", &rows, &o_tokens, &o_positions,
                        &o_slots, &o_tables, &o_ctx, &block_size,
                        &pad_slot)) {
    return nullptr;
  }
  I32Buffer bufs[5];
  PyObject* objs[5] = {o_tokens, o_positions, o_slots, o_tables, o_ctx};
  for (int i = 0; i < 5; i++) {
    if (!acquire_i32(objs[i], &bufs[i])) {
      release(bufs, 5);
      return nullptr;
    }
  }
  int32_t* tokens = bufs[0].data;
  int32_t* positions = bufs[1].data;
  int32_t* slots = bufs[2].data;
  int32_t* tables = bufs[3].data;
  int32_t* ctx = bufs[4].data;
  const Py_ssize_t B = bufs[0].len;
  const Py_ssize_t MB = B > 0 ? bufs[3].len / B : 0;

  PyObject* seq = PySequence_Fast(rows, "rows must be a sequence");
  if (seq == nullptr) {
    release(bufs, 5);
    return nullptr;
  }
  const Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);
  bool error = n > B;
  if (error) {
    PyErr_SetString(PyExc_ValueError, "more rows than batch capacity");
  }
  for (Py_ssize_t i = 0; !error && i < n; i++) {
    PyObject* row = PySequence_Fast_GET_ITEM(seq, i);  // borrowed
    PyObject* table_obj;
    long token, length;
    if (!PyArg_ParseTuple(row, "llO", &token, &length, &table_obj)) {
      error = true;
      break;
    }
    PyObject* table = PySequence_Fast(table_obj, "table must be a sequence");
    if (table == nullptr) {
      error = true;
      break;
    }
    const Py_ssize_t nt = PySequence_Fast_GET_SIZE(table);
    if (nt > MB) {
      PyErr_SetString(PyExc_ValueError, "block table wider than bucket");
      Py_DECREF(table);
      error = true;
      break;
    }
    const long pos = length - 1;
    tokens[i] = static_cast<int32_t>(token);
    positions[i] = static_cast<int32_t>(pos);
    ctx[i] = static_cast<int32_t>(length);
    for (Py_ssize_t j = 0; j < nt; j++) {
      const long b = PyLong_AsLong(PySequence_Fast_GET_ITEM(table, j));
      tables[i * MB + j] = static_cast<int32_t>(b);
    }
    const long blk = pos / block_size;
    if (blk < nt) {
      const long base =
          PyLong_AsLong(PySequence_Fast_GET_ITEM(table, blk));
      slots[i] = static_cast<int32_t>(base * block_size + pos % block_size);
    } else {
      slots[i] = static_cast<int32_t>(pad_slot);
    }
    Py_DECREF(table);
    if (PyErr_Occurred() != nullptr) error = true;
  }
  Py_DECREF(seq);
  release(bufs, 5);
  if (error) return nullptr;
  Py_RETURN_NONE;
}

// fill_prefill(seqs, tokens, positions, seq_ids, slots, logits_idx,
//              block_size, pad_slot)
//
// seqs: sequence of (token_ids:sequence[int], table:sequence[int]).
// tokens/positions/seq_ids/slots: int32[T] pre-filled with padding;
// logits_idx: int32[S]. Returns the total packed token count.
PyObject* fill_prefill(PyObject*, PyObject* args) {
  PyObject *seqs, *o_tokens, *o_positions, *o_seq_ids, *o_slots, *o_logits;
  long block_size, pad_slot;
  if (!PyArg_ParseTuple(args, "OOOOOOll", &seqs, &o_tokens, &o_positions,
                        &o_seq_ids, &o_slots, &o_logits, &block_size,
                        &pad_slot)) {
    return nullptr;
  }
  I32Buffer bufs[5];
  PyObject* objs[5] = {o_tokens, o_positions, o_seq_ids, o_slots, o_logits};
  for (int i = 0; i < 5; i++) {
    if (!acquire_i32(objs[i], &bufs[i])) {
      release(bufs, 5);
      return nullptr;
    }
  }
  int32_t* tokens = bufs[0].data;
  int32_t* positions = bufs[1].data;
  int32_t* seq_ids = bufs[2].data;
  int32_t* slots = bufs[3].data;
  int32_t* logits_idx = bufs[4].data;
  const Py_ssize_t T = bufs[0].len;
  const Py_ssize_t S = bufs[4].len;

  PyObject* seq = PySequence_Fast(seqs, "seqs must be a sequence");
  if (seq == nullptr) {
    release(bufs, 5);
    return nullptr;
  }
  const Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);
  Py_ssize_t cursor = 0;
  bool error = n > S;
  if (error) {
    PyErr_SetString(PyExc_ValueError, "more prompts than metadata slots");
  }
  for (Py_ssize_t i = 0; !error && i < n; i++) {
    PyObject* row = PySequence_Fast_GET_ITEM(seq, i);
    PyObject *ids_obj, *table_obj;
    if (!PyArg_ParseTuple(row, "OO", &ids_obj, &table_obj)) {
      error = true;
      break;
    }
    PyObject* ids = PySequence_Fast(ids_obj, "token_ids");
    PyObject* table = PySequence_Fast(table_obj, "table");
    if (ids == nullptr || table == nullptr) {
      Py_XDECREF(ids);
      Py_XDECREF(table);
      error = true;
      break;
    }
    const Py_ssize_t len = PySequence_Fast_GET_SIZE(ids);
    const Py_ssize_t nt = PySequence_Fast_GET_SIZE(table);
    if (cursor + len > T || (len + block_size - 1) / block_size > nt) {
      PyErr_SetString(PyExc_ValueError,
                      "prompt overflows token bucket or block table");
      Py_DECREF(ids);
      Py_DECREF(table);
      error = true;
      break;
    }
    for (Py_ssize_t pos = 0; pos < len; pos++) {
      tokens[cursor] =
          static_cast<int32_t>(PyLong_AsLong(
              PySequence_Fast_GET_ITEM(ids, pos)));
      positions[cursor] = static_cast<int32_t>(pos);
      seq_ids[cursor] = static_cast<int32_t>(i);
      const long base = PyLong_AsLong(
          PySequence_Fast_GET_ITEM(table, pos / block_size));
      slots[cursor] =
          static_cast<int32_t>(base * block_size + pos % block_size);
      cursor++;
    }
    logits_idx[i] = static_cast<int32_t>(cursor - 1);
    Py_DECREF(ids);
    Py_DECREF(table);
    if (PyErr_Occurred() != nullptr) error = true;
  }
  Py_DECREF(seq);
  release(bufs, 5);
  if (error) return nullptr;
  return PyLong_FromSsize_t(cursor);
}

PyMethodDef kMethods[] = {
    {"fill_decode", fill_decode, METH_VARARGS,
     "Fill padded decode plan arrays from per-sequence rows."},
    {"fill_prefill", fill_prefill, METH_VARARGS,
     "Fill padded packed-prefill plan arrays; returns token count."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "_plan_packer",
    "Native batch packer for vllm_tpu (host hot path).", -1, kMethods,
};

}  // namespace

PyMODINIT_FUNC PyInit__plan_packer() { return PyModule_Create(&kModule); }
