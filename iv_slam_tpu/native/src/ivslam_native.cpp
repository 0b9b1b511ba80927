// Host-side native runtime for iv_slam_tpu.
//
// TPU-native replacement for the reference's host-bound native code paths:
//   * DBoW2 ORB-vocabulary text parsing (Thirdparty/DBoW2
//     TemplatedVocabulary::loadFromTextFile semantics) — a ~1M-node text
//     file that Python parses in minutes and this module in ~1 s;
//   * vocabulary transform (tree descent: per-level 256-bit Hamming argmin)
//     as the host fallback / oracle for the batched device version;
//   * dense popcount Hamming distance matrices for host-side bookkeeping
//     (map-point distinctive descriptors etc.).
//
// Built as a plain CPython extension (no pybind11) via setup.py; the
// Python layer (iv_slam_tpu/slam/vocabulary.py) falls back to NumPy when
// the extension is unavailable.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "numpy/arrayobject.h"

namespace {

inline int popcount256(const uint8_t* a, const uint8_t* b) {
  const uint64_t* x = reinterpret_cast<const uint64_t*>(a);
  const uint64_t* y = reinterpret_cast<const uint64_t*>(b);
  int d = 0;
  for (int i = 0; i < 4; i++) d += __builtin_popcountll(x[i] ^ y[i]);
  return d;
}

// ---------------------------------------------------------------------------
// hamming_matrix(a: (N,32) u8, b: (M,32) u8) -> (N,M) int32
// ---------------------------------------------------------------------------
PyObject* hamming_matrix(PyObject*, PyObject* args) {
  PyArrayObject *a_obj, *b_obj;
  if (!PyArg_ParseTuple(args, "O!O!", &PyArray_Type, &a_obj, &PyArray_Type,
                        &b_obj))
    return nullptr;
  PyArrayObject* a = (PyArrayObject*)PyArray_ContiguousFromAny(
      (PyObject*)a_obj, NPY_UINT8, 2, 2);
  PyArrayObject* b = (PyArrayObject*)PyArray_ContiguousFromAny(
      (PyObject*)b_obj, NPY_UINT8, 2, 2);
  if (!a || !b) return nullptr;
  npy_intp n = PyArray_DIM(a, 0), m = PyArray_DIM(b, 0);
  npy_intp dims[2] = {n, m};
  PyArrayObject* out = (PyArrayObject*)PyArray_SimpleNew(2, dims, NPY_INT32);
  const uint8_t* ap = (const uint8_t*)PyArray_DATA(a);
  const uint8_t* bp = (const uint8_t*)PyArray_DATA(b);
  int32_t* op = (int32_t*)PyArray_DATA(out);
  Py_BEGIN_ALLOW_THREADS
  for (npy_intp i = 0; i < n; i++)
    for (npy_intp j = 0; j < m; j++)
      op[i * m + j] = popcount256(ap + 32 * i, bp + 32 * j);
  Py_END_ALLOW_THREADS
  Py_DECREF(a);
  Py_DECREF(b);
  return (PyObject*)out;
}

// ---------------------------------------------------------------------------
// parse_vocab_text(path) -> (k, L, scoring, weighting,
//                            children (nodes, k) i32, descriptors (nodes, 32)
//                            u8, weights (nodes,) f32, is_leaf (nodes,) u8,
//                            word_id (nodes,) i32)
// DBoW2 text format: header "k L scoring weighting", then one line per
// non-root node: "parent_id is_leaf d0 .. d31 weight".
// ---------------------------------------------------------------------------
PyObject* parse_vocab_text(PyObject*, PyObject* args) {
  const char* path;
  if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;

  FILE* f = fopen(path, "r");
  if (!f) {
    PyErr_SetString(PyExc_FileNotFoundError, path);
    return nullptr;
  }

  int k = 0, L = 0, scoring = 0, weighting = 0;
  if (fscanf(f, "%d %d %d %d", &k, &L, &scoring, &weighting) != 4) {
    fclose(f);
    PyErr_SetString(PyExc_ValueError, "bad vocabulary header");
    return nullptr;
  }

  std::vector<int32_t> parents(1, -1);
  std::vector<uint8_t> descs(32, 0);
  std::vector<float> weights(1, 0.0f);
  std::vector<uint8_t> leaves(1, 0);

  Py_BEGIN_ALLOW_THREADS
  for (;;) {
    int parent, is_leaf;
    if (fscanf(f, "%d %d", &parent, &is_leaf) != 2) break;
    uint8_t d[32];
    bool ok = true;
    for (int i = 0; i < 32; i++) {
      unsigned v;
      if (fscanf(f, "%u", &v) != 1) {
        ok = false;
        break;
      }
      d[i] = (uint8_t)v;
    }
    double w = 0.0;
    if (!ok || fscanf(f, "%lf", &w) != 1) break;
    parents.push_back(parent);
    descs.insert(descs.end(), d, d + 32);
    weights.push_back((float)w);
    leaves.push_back((uint8_t)(is_leaf != 0));
  }
  Py_END_ALLOW_THREADS
  fclose(f);

  npy_intp n_nodes = (npy_intp)parents.size();
  npy_intp d1[1] = {n_nodes};
  npy_intp d2[2] = {n_nodes, 32};

  PyArrayObject* parents_a =
      (PyArrayObject*)PyArray_SimpleNew(1, d1, NPY_INT32);
  PyArrayObject* descs_a = (PyArrayObject*)PyArray_SimpleNew(2, d2, NPY_UINT8);
  PyArrayObject* weights_a =
      (PyArrayObject*)PyArray_SimpleNew(1, d1, NPY_FLOAT32);
  PyArrayObject* leaves_a =
      (PyArrayObject*)PyArray_SimpleNew(1, d1, NPY_UINT8);
  memcpy(PyArray_DATA(parents_a), parents.data(), n_nodes * 4);
  memcpy(PyArray_DATA(descs_a), descs.data(), n_nodes * 32);
  memcpy(PyArray_DATA(weights_a), weights.data(), n_nodes * 4);
  memcpy(PyArray_DATA(leaves_a), leaves.data(), n_nodes);

  return Py_BuildValue("(iiiiNNNN)", k, L, scoring, weighting,
                       (PyObject*)parents_a, (PyObject*)descs_a,
                       (PyObject*)weights_a, (PyObject*)leaves_a);
}

// ---------------------------------------------------------------------------
// vocab_transform(children (nodes,k) i32, node_desc (nodes,32) u8,
//                 desc (N,32) u8, levels) -> (N,) i32 leaf node ids
// Tree descent: at each node pick the child with min Hamming distance.
// children[node, j] < 0 means no child (leaf).
// ---------------------------------------------------------------------------
PyObject* vocab_transform(PyObject*, PyObject* args) {
  PyArrayObject *children_o, *ndesc_o, *desc_o;
  if (!PyArg_ParseTuple(args, "O!O!O!", &PyArray_Type, &children_o,
                        &PyArray_Type, &ndesc_o, &PyArray_Type, &desc_o))
    return nullptr;
  PyArrayObject* children = (PyArrayObject*)PyArray_ContiguousFromAny(
      (PyObject*)children_o, NPY_INT32, 2, 2);
  PyArrayObject* ndesc = (PyArrayObject*)PyArray_ContiguousFromAny(
      (PyObject*)ndesc_o, NPY_UINT8, 2, 2);
  PyArrayObject* desc = (PyArrayObject*)PyArray_ContiguousFromAny(
      (PyObject*)desc_o, NPY_UINT8, 2, 2);
  if (!children || !ndesc || !desc) return nullptr;

  npy_intp n = PyArray_DIM(desc, 0);
  npy_intp k = PyArray_DIM(children, 1);
  const int32_t* ch = (const int32_t*)PyArray_DATA(children);
  const uint8_t* nd = (const uint8_t*)PyArray_DATA(ndesc);
  const uint8_t* dp = (const uint8_t*)PyArray_DATA(desc);

  npy_intp d1[1] = {n};
  PyArrayObject* out = (PyArrayObject*)PyArray_SimpleNew(1, d1, NPY_INT32);
  int32_t* op = (int32_t*)PyArray_DATA(out);

  Py_BEGIN_ALLOW_THREADS
  for (npy_intp i = 0; i < n; i++) {
    const uint8_t* d = dp + 32 * i;
    int32_t node = 0;
    for (;;) {
      const int32_t* kids = ch + node * k;
      if (kids[0] < 0) break;  // leaf
      int best = kids[0];
      int best_d = popcount256(d, nd + 32 * kids[0]);
      for (npy_intp j = 1; j < k && kids[j] >= 0; j++) {
        int dd = popcount256(d, nd + 32 * kids[j]);
        if (dd < best_d) {
          best_d = dd;
          best = kids[j];
        }
      }
      node = best;
    }
    op[i] = node;
  }
  Py_END_ALLOW_THREADS

  Py_DECREF(children);
  Py_DECREF(ndesc);
  Py_DECREF(desc);
  return (PyObject*)out;
}

PyMethodDef methods[] = {
    {"hamming_matrix", hamming_matrix, METH_VARARGS,
     "Dense popcount Hamming distance matrix"},
    {"parse_vocab_text", parse_vocab_text, METH_VARARGS,
     "Parse a DBoW2 ORB vocabulary text file"},
    {"vocab_transform", vocab_transform, METH_VARARGS,
     "Vocabulary-tree descent for a batch of descriptors"},
    {nullptr, nullptr, 0, nullptr},
};

struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_ivslam_native", nullptr, -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__ivslam_native(void) {
  import_array();
  return PyModule_Create(&moduledef);
}
