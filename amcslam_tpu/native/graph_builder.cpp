// Native SoA graph builder (the C++ runtime component of the framework).
//
// The reference's problem construction is C++ loops over observations
// (Optimizer.cc:86-304, :857-1214). The TPU rebuild keeps construction on
// the host but moves the per-observation hot loops out of Python: given the
// map in SoA form (concatenated keyframe match tables + landmark registry),
// emit the padded edge arrays consumed by the jitted solvers. This is a
// plain CPython C-API extension (no pybind11 in the image; Environment
// notes) operating on NumPy buffers.
//
// Exposed functions:
//   build_obs_edges(matches (sum_Nk,) int64,   // mp id per global kp, -1
//                   kf_of_kp (sum_Nk,) int32,  // owning KF slot per kp
//                   cam_of_kp (sum_Nk,) int32, // camera per kp
//                   prev_slot (K,) int32,      // temporal-prev slot or -1
//                   lm_slot_keys (M,) int64, lm_slot_vals (M,) int32,
//                   // sorted map: map-point id -> landmark slot
//                   n_stereo_cam int)
//     -> (mono (Em, 5) float64 rows [i, j, lm, cam, kp_index],
//         stereo (Es, 3) float64 rows [pose, lm, kp_index])
//
//   hamming_matrix(a (N,32) uint8, b (M,32) uint8) -> (N,M) int32
//     host-side popcount table (used when the device round trip is not
//     worth it for tiny N*M).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Buf {
  Py_buffer view{};
  bool ok = false;
  ~Buf() {
    if (ok) PyBuffer_Release(&view);
  }
  bool acquire(PyObject* obj, int flags = PyBUF_C_CONTIGUOUS) {
    if (PyObject_GetBuffer(obj, &view, flags) != 0) return false;
    ok = true;
    return true;
  }
};

int64_t lookup(const int64_t* keys, const int32_t* vals, Py_ssize_t m,
               int64_t key) {
  Py_ssize_t lo = 0, hi = m;
  while (lo < hi) {
    Py_ssize_t mid = (lo + hi) / 2;
    if (keys[mid] < key)
      lo = mid + 1;
    else
      hi = mid;
  }
  if (lo < m && keys[lo] == key) return vals[lo];
  return -1;
}

PyObject* build_obs_edges(PyObject*, PyObject* args) {
  PyObject *o_matches, *o_kf, *o_cam, *o_prev, *o_keys, *o_vals;
  int n_stereo_cam;
  if (!PyArg_ParseTuple(args, "OOOOOOi", &o_matches, &o_kf, &o_cam,
                        &o_prev, &o_keys, &o_vals, &n_stereo_cam))
    return nullptr;

  Buf b_matches, b_kf, b_cam, b_prev, b_keys, b_vals;
  if (!b_matches.acquire(o_matches) || !b_kf.acquire(o_kf) ||
      !b_cam.acquire(o_cam) ||
      !b_prev.acquire(o_prev) || !b_keys.acquire(o_keys) ||
      !b_vals.acquire(o_vals))
    return nullptr;

  const int64_t* matches = static_cast<const int64_t*>(b_matches.view.buf);
  const int32_t* kf_of = static_cast<const int32_t*>(b_kf.view.buf);
  const int32_t* cam_of = static_cast<const int32_t*>(b_cam.view.buf);
  const int32_t* prev_slot = static_cast<const int32_t*>(b_prev.view.buf);
  const int64_t* keys = static_cast<const int64_t*>(b_keys.view.buf);
  const int32_t* vals = static_cast<const int32_t*>(b_vals.view.buf);
  Py_ssize_t n_kp = b_matches.view.len / (Py_ssize_t)sizeof(int64_t);
  Py_ssize_t n_lm = b_keys.view.len / (Py_ssize_t)sizeof(int64_t);

  std::vector<double> mono, stereo;
  mono.reserve(n_kp * 5 / 4);
  stereo.reserve(n_kp * 3 / 2);

  for (Py_ssize_t g = 0; g < n_kp; ++g) {
    int64_t mp = matches[g];
    if (mp < 0) continue;
    int64_t lm = lookup(keys, vals, n_lm, mp);
    if (lm < 0) continue;
    int32_t s = kf_of[g];
    int32_t c = cam_of[g];
    if (c == n_stereo_cam) {
      stereo.push_back((double)s);
      stereo.push_back((double)lm);
      stereo.push_back((double)g);
    } else {
      int32_t p = prev_slot[s];
      if (p < 0) continue;
      mono.push_back((double)p);
      mono.push_back((double)s);
      mono.push_back((double)lm);
      mono.push_back((double)c);
      mono.push_back((double)g);
    }
  }

  // return as bytes; the Python wrapper re-views them as float64 arrays
  PyObject* mono_b = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(mono.data()),
      (Py_ssize_t)(mono.size() * sizeof(double)));
  PyObject* st_b = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(stereo.data()),
      (Py_ssize_t)(stereo.size() * sizeof(double)));
  PyObject* out = PyTuple_Pack(2, mono_b, st_b);
  Py_XDECREF(mono_b);
  Py_XDECREF(st_b);
  return out;
}

PyObject* hamming_matrix(PyObject*, PyObject* args) {
  PyObject *o_a, *o_b;
  if (!PyArg_ParseTuple(args, "OO", &o_a, &o_b)) return nullptr;
  Buf a, b;
  if (!a.acquire(o_a) || !b.acquire(o_b)) return nullptr;
  Py_ssize_t n = a.view.len / 32, m = b.view.len / 32;
  const uint64_t* pa = static_cast<const uint64_t*>(a.view.buf);
  const uint64_t* pb = static_cast<const uint64_t*>(b.view.buf);

  std::vector<int32_t> out((size_t)n * (size_t)m);
  for (Py_ssize_t i = 0; i < n; ++i) {
    const uint64_t* da = pa + i * 4;
    for (Py_ssize_t j = 0; j < m; ++j) {
      const uint64_t* db = pb + j * 4;
      int32_t d = 0;
      for (int k = 0; k < 4; ++k) d += __builtin_popcountll(da[k] ^ db[k]);
      out[(size_t)i * m + j] = d;
    }
  }
  return PyBytes_FromStringAndSize(reinterpret_cast<const char*>(out.data()),
                                   (Py_ssize_t)(out.size() * sizeof(int32_t)));
}

PyMethodDef methods[] = {
    {"build_obs_edges", build_obs_edges, METH_VARARGS,
     "SoA observation-edge extraction"},
    {"hamming_matrix", hamming_matrix, METH_VARARGS,
     "popcount Hamming distance table"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_graph_builder",
    "native SoA graph builder for amcslam_tpu", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__graph_builder(void) {
  return PyModule_Create(&moduledef);
}
