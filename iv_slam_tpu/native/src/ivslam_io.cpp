// Native asynchronous stereo data-loader.
//
// The reference decodes images synchronously on the tracking thread
// (stereo_kitti.cc:444-468: cv::imread + cv::remap per frame). Here a C++
// worker pool decodes and rectifies a bounded window of upcoming frames in
// the background, so the Python driver's next() is a queue pop and disk
// latency/PNG inflate never sits on the per-frame critical path feeding
// the TPU frontend.
//
// Exposed via the CPython C API (module _ivslam_io):
//   open(left_paths, right_paths, prefetch, threads) -> id
//   set_rectify(id, m1x, m1y, m2x, m2y)   float32 HxW maps per side
//   next(id) -> (left uint8 HxW ndarray, right ndarray)  in sequence order
//   close(id)
// Loaded lazily by iv_slam_tpu.io.prefetch with a Python-thread fallback.

#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <Python.h>
#include <numpy/arrayobject.h>

#include <condition_variable>
#include <map>
#include <memory>
#include <mutex>
#include <stdexcept>
#include <string>
#include <thread>
#include <vector>

#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

namespace {

struct Loader {
  std::vector<std::string> left, right;
  int right_mode = 0;  // 0=grayscale, 1=unchanged (16-bit depth), 2=skip
  cv::Mat m1x, m1y, m2x, m2y;  // empty = no rectification
  size_t prefetch = 4;
  size_t next_emit = 0;    // frame index the consumer will ask for next
  size_t next_job = 0;     // next frame index a worker may claim
  bool closing = false;
  bool go = false;         // workers idle until the first next() — gives
                           // set_rectify a race-free window after open()
  std::map<size_t, std::pair<cv::Mat, cv::Mat>> ready;
  std::mutex mu;
  std::condition_variable cv_ready, cv_work;
  std::vector<std::thread> workers;

  void Run() {
    for (;;) {
      size_t idx;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_work.wait(lk, [&] {
          return closing ||
                 (go && next_job < left.size() &&
                  next_job < next_emit + prefetch);
        });
        if (closing) return;
        idx = next_job++;
      }
      cv::Mat l = cv::imread(left[idx], cv::IMREAD_GRAYSCALE);
      cv::Mat r;
      if (right_mode == 0)
        r = cv::imread(right[idx], cv::IMREAD_GRAYSCALE);
      else if (right_mode == 1)
        r = cv::imread(right[idx], cv::IMREAD_UNCHANGED);
      if (!l.empty() && !m1x.empty()) {
        cv::Mat t;  // remap cannot run in-place (src/dst alias)
        cv::remap(l, t, m1x, m1y, cv::INTER_LINEAR);
        l = t;
      }
      if (!r.empty() && !m2x.empty()) {
        cv::Mat t;
        cv::remap(r, t, m2x, m2y, cv::INTER_LINEAR);
        r = t;
      }
      {
        std::lock_guard<std::mutex> lk(mu);
        ready.emplace(idx, std::make_pair(l, r));
      }
      cv_ready.notify_all();
    }
  }

  void Start(int threads) {
    for (int i = 0; i < threads; ++i)
      workers.emplace_back([this] { Run(); });
  }

  ~Loader() {
    {
      std::lock_guard<std::mutex> lk(mu);
      closing = true;
    }
    cv_work.notify_all();
    for (auto& t : workers) t.join();
  }
};

std::mutex g_mu;
std::map<long, std::unique_ptr<Loader>> g_loaders;
long g_next_id = 1;

Loader* Get(long id) {
  std::lock_guard<std::mutex> lk(g_mu);
  auto it = g_loaders.find(id);
  return it == g_loaders.end() ? nullptr : it->second.get();
}

bool ListToStrings(PyObject* list, std::vector<std::string>* out) {
  PyObject* seq = PySequence_Fast(list, "expected a sequence of paths");
  if (!seq) return false;
  Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);
  out->reserve(n);
  for (Py_ssize_t i = 0; i < n; ++i) {
    PyObject* s = PySequence_Fast_GET_ITEM(seq, i);
    const char* c = PyUnicode_AsUTF8(s);
    if (!c) {
      Py_DECREF(seq);
      return false;
    }
    out->emplace_back(c);
  }
  Py_DECREF(seq);
  return true;
}

PyObject* loader_open(PyObject*, PyObject* args) {
  PyObject *llist, *rlist;
  int prefetch = 4, threads = 2, right_mode = 0;
  if (!PyArg_ParseTuple(args, "OO|iii", &llist, &rlist, &prefetch, &threads,
                        &right_mode))
    return nullptr;
  auto ld = std::make_unique<Loader>();
  if (!ListToStrings(llist, &ld->left) || !ListToStrings(rlist, &ld->right))
    return nullptr;
  if (ld->left.size() != ld->right.size()) {
    PyErr_SetString(PyExc_ValueError, "left/right path counts differ");
    return nullptr;
  }
  ld->prefetch = prefetch > 0 ? prefetch : 1;
  ld->right_mode = right_mode;
  long id;
  {
    std::lock_guard<std::mutex> lk(g_mu);
    id = g_next_id++;
    ld->Start(threads > 0 ? threads : 1);
    g_loaders.emplace(id, std::move(ld));
  }
  g_loaders[id]->cv_work.notify_all();
  return PyLong_FromLong(id);
}

bool MapFromArray(PyObject* obj, cv::Mat* out) {
  if (obj == Py_None) return true;
  PyArrayObject* a = (PyArrayObject*)PyArray_FROM_OTF(
      obj, NPY_FLOAT32, NPY_ARRAY_C_CONTIGUOUS | NPY_ARRAY_ALIGNED);
  if (!a || PyArray_NDIM(a) != 2) {
    Py_XDECREF(a);
    PyErr_SetString(PyExc_ValueError, "rectify map must be 2-D float32");
    return false;
  }
  cv::Mat m((int)PyArray_DIM(a, 0), (int)PyArray_DIM(a, 1), CV_32FC1,
            PyArray_DATA(a));
  m.copyTo(*out);  // own the data; drop the numpy ref
  Py_DECREF(a);
  return true;
}

PyObject* loader_set_rectify(PyObject*, PyObject* args) {
  long id;
  PyObject *m1x, *m1y, *m2x, *m2y;
  if (!PyArg_ParseTuple(args, "lOOOO", &id, &m1x, &m1y, &m2x, &m2y))
    return nullptr;
  Loader* ld = Get(id);
  if (!ld) {
    PyErr_SetString(PyExc_ValueError, "bad loader id");
    return nullptr;
  }
  // convert with the GIL held, without ld->mu (see loader_next)
  cv::Mat a, b, c, d;
  if (!MapFromArray(m1x, &a) || !MapFromArray(m1y, &b) ||
      !MapFromArray(m2x, &c) || !MapFromArray(m2y, &d))
    return nullptr;
  bool started = false;
  Py_BEGIN_ALLOW_THREADS
  {
    std::lock_guard<std::mutex> lk(ld->mu);
    if (ld->go) {
      started = true;
    } else {
      ld->m1x = a; ld->m1y = b; ld->m2x = c; ld->m2y = d;
    }
  }
  Py_END_ALLOW_THREADS
  if (started) {
    PyErr_SetString(PyExc_RuntimeError,
                    "set_rectify must precede the first next()");
    return nullptr;
  }
  Py_RETURN_NONE;
}

PyObject* MatToArray(const cv::Mat& m) {
  if (m.empty()) Py_RETURN_NONE;
  int npy_type;
  switch (m.type()) {
    case CV_8UC1:  npy_type = NPY_UINT8; break;
    case CV_16UC1: npy_type = NPY_UINT16; break;  // TUM RGB-D depth PNGs
    case CV_8UC3:  npy_type = NPY_UINT8; break;
    default: {
      PyErr_Format(PyExc_TypeError, "unsupported cv type %d", m.type());
      return nullptr;
    }
  }
  int nd = m.channels() == 1 ? 2 : 3;
  npy_intp dims[3] = {m.rows, m.cols, m.channels()};
  PyObject* arr = PyArray_SimpleNew(nd, dims, npy_type);
  if (!arr) return nullptr;
  cv::Mat dst(m.rows, m.cols, m.type(),
              PyArray_DATA((PyArrayObject*)arr));
  m.copyTo(dst);
  return arr;
}

PyObject* loader_next(PyObject*, PyObject* args) {
  long id;
  if (!PyArg_ParseTuple(args, "l", &id)) return nullptr;
  Loader* ld = Get(id);
  if (!ld) {
    PyErr_SetString(PyExc_ValueError, "bad loader id");
    return nullptr;
  }
  cv::Mat l, r;
  bool exhausted = false;
  // take ld->mu only with the GIL released: a thread holding mu while
  // waiting for the GIL + a GIL-holding thread blocking on mu is a
  // deadlock, so no Python API runs inside the locked region
  Py_BEGIN_ALLOW_THREADS
  {
    std::unique_lock<std::mutex> lk(ld->mu);
    if (!ld->go) {
      ld->go = true;
      ld->cv_work.notify_all();
    }
    if (ld->next_emit >= ld->left.size()) {
      exhausted = true;
    } else {
      size_t idx = ld->next_emit;
      ld->cv_ready.wait(lk, [&] { return ld->ready.count(idx) > 0; });
      auto it = ld->ready.find(idx);
      l = it->second.first;
      r = it->second.second;
      ld->ready.erase(it);
      ld->next_emit++;
    }
  }
  if (!exhausted) ld->cv_work.notify_all();  // the window advanced
  Py_END_ALLOW_THREADS
  if (exhausted) {
    PyErr_SetString(PyExc_StopIteration, "sequence exhausted");
    return nullptr;
  }
  PyObject* la = MatToArray(l);
  if (!la) return nullptr;
  PyObject* ra = MatToArray(r);
  if (!ra) {
    Py_DECREF(la);
    return nullptr;
  }
  return PyTuple_Pack(2, la, ra);
}

PyObject* loader_close(PyObject*, PyObject* args) {
  long id;
  if (!PyArg_ParseTuple(args, "l", &id)) return nullptr;
  std::unique_ptr<Loader> ld;
  {
    std::lock_guard<std::mutex> lk(g_mu);
    auto it = g_loaders.find(id);
    if (it != g_loaders.end()) {
      ld = std::move(it->second);
      g_loaders.erase(it);
    }
  }
  if (ld) {
    Py_BEGIN_ALLOW_THREADS
    ld.reset();  // joins workers
    Py_END_ALLOW_THREADS
  }
  Py_RETURN_NONE;
}

PyMethodDef methods[] = {
    {"open", loader_open, METH_VARARGS,
     "open(left_paths, right_paths, prefetch=4, threads=2, right_mode=0)"
     " -> id; right_mode: 0 grayscale, 1 unchanged (depth), 2 skip"},
    {"set_rectify", loader_set_rectify, METH_VARARGS,
     "set_rectify(id, m1x, m1y, m2x, m2y) - float32 maps, None to skip"},
    {"next", loader_next, METH_VARARGS,
     "next(id) -> (left, right) uint8 arrays in sequence order"},
    {"close", loader_close, METH_VARARGS, "close(id)"},
    {nullptr, nullptr, 0, nullptr},
};

struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_ivslam_io", nullptr, -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__ivslam_io(void) {
  import_array();
  return PyModule_Create(&moduledef);
}
