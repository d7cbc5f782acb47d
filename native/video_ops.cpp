// Native host-side video transform kernel.
//
// The reference's input pipeline leans on decord's C++ decode+transform
// (SURVEY.md §2.4 item 5). Decode stays in OpenCV's C++ (via cv2); this
// extension makes the per-clip transform native too: fused bilinear
// resize + crop + [0,1] normalize + CHW transpose over all frames of a clip
// in one C++ call (OpenMP across frames), replacing a Python per-frame loop.
//
// Exposed functions:
//   resize_crop_chw(frames_u8, top, left, crop_h, crop_w, out_h, out_w)
//     frames_u8: contiguous uint8 [T, H, W, 3]
//     returns   float32 [3, T, out_h, out_w] in [0, 1]
//   resize_crop_chw_u8(...)  same, but returns uint8 [3, T, out_h, out_w]
//     in [0, 255] (rounded) — for pipelines that normalize on-device and
//     ship 4x fewer bytes over the host->device link.
// The crop window is taken first, then bilinearly resized to (out_h, out_w).
//
// Built as a plain CPython extension (no pybind11 — see repo build notes) by
// native/build.py; video_tokenizer_tpu.data falls back to numpy+cv2 when the
// extension is not built.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct Buf {
  Py_buffer view{};
  bool ok = false;
  ~Buf() {
    if (ok) PyBuffer_Release(&view);
  }
};

// Separable bilinear: precomputed x coefficients, horizontal pass into a
// planar scratch row pair, vertical blend — vectorizable inner loops.
struct XCoef {
  std::vector<int32_t> x0, x1;
  std::vector<float> wx;
};

XCoef MakeXCoef(int64_t cw, int64_t ow) {
  XCoef c;
  c.x0.resize(ow);
  c.x1.resize(ow);
  c.wx.resize(ow);
  const float sx = static_cast<float>(cw) / static_cast<float>(ow);
  for (int64_t x = 0; x < ow; ++x) {
    float fx = (static_cast<float>(x) + 0.5f) * sx - 0.5f;
    fx = std::max(0.0f, std::min(fx, static_cast<float>(cw - 1)));
    c.x0[x] = static_cast<int32_t>(fx);
    c.x1[x] = static_cast<int32_t>(std::min<int64_t>(c.x0[x] + 1, cw - 1));
    c.wx[x] = fx - static_cast<float>(c.x0[x]);
  }
  return c;
}

// horizontal pass: one source row -> planar [3][ow] floats
inline void HRow(const uint8_t* row, int64_t left, const XCoef& c, int64_t ow,
                 float* out /* [3*ow], planar */) {
  const uint8_t* p = row + left * 3;
  for (int64_t x = 0; x < ow; ++x) {
    const uint8_t* a = p + c.x0[x] * 3;
    const uint8_t* b = p + c.x1[x] * 3;
    const float w = c.wx[x];
    out[0 * ow + x] = static_cast<float>(a[0]) + (static_cast<float>(b[0]) - static_cast<float>(a[0])) * w;
    out[1 * ow + x] = static_cast<float>(a[1]) + (static_cast<float>(b[1]) - static_cast<float>(a[1])) * w;
    out[2 * ow + x] = static_cast<float>(a[2]) + (static_cast<float>(b[2]) - static_cast<float>(a[2])) * w;
  }
}

struct StoreFloat01 {
  static float Map(float v) { return v * (1.0f / 255.0f); }
  using T = float;
};
struct StoreU8 {
  static uint8_t Map(float v) {
    v += 0.5f;  // round-to-nearest; v is already in [0, 255]
    return static_cast<uint8_t>(v < 0.0f ? 0.0f : (v > 255.0f ? 255.0f : v));
  }
  using T = uint8_t;
};

template <typename Store>
void ResizeFrameCHW(const uint8_t* src, int64_t H, int64_t W, int64_t top,
                    int64_t left, int64_t ch, int64_t cw, int64_t oh,
                    int64_t ow, typename Store::T* dst, int64_t plane_stride,
                    const XCoef& xc, float* scratch /* [2][3*ow] */) {
  const float sy = static_cast<float>(ch) / static_cast<float>(oh);
  int64_t cached_y0 = -1, cached_y1 = -1;
  float* row_a = scratch;
  float* row_b = scratch + 3 * ow;
  for (int64_t y = 0; y < oh; ++y) {
    float fy = (static_cast<float>(y) + 0.5f) * sy - 0.5f;
    fy = std::max(0.0f, std::min(fy, static_cast<float>(ch - 1)));
    int64_t y0 = static_cast<int64_t>(fy);
    int64_t y1 = std::min(y0 + 1, ch - 1);
    float wy = fy - static_cast<float>(y0);
    if (y0 != cached_y0) {
      if (y0 == cached_y1) {
        std::swap(row_a, row_b);
        cached_y0 = y0;
        cached_y1 = -1;
      } else {
        HRow(src + (top + y0) * W * 3, left, xc, ow, row_a);
        cached_y0 = y0;
        cached_y1 = -1;
      }
    }
    if (y1 != cached_y1) {
      HRow(src + (top + y1) * W * 3, left, xc, ow, row_b);
      cached_y1 = y1;
    }
    for (int c = 0; c < 3; ++c) {
      const float* ra = row_a + c * ow;
      const float* rb = row_b + c * ow;
      typename Store::T* o = dst + c * plane_stride + y * ow;
      for (int64_t x = 0; x < ow; ++x) {
        o[x] = Store::Map(ra[x] + (rb[x] - ra[x]) * wy);
      }
    }
  }
}

template <typename Store>
PyObject* ResizeCropCHWImpl(PyObject* args) {
  PyObject* frames_obj = nullptr;
  long long top, left, crop_h, crop_w, out_h, out_w;
  if (!PyArg_ParseTuple(args, "OLLLLLL", &frames_obj, &top, &left, &crop_h,
                        &crop_w, &out_h, &out_w)) {
    return nullptr;
  }
  Buf buf;
  if (PyObject_GetBuffer(frames_obj, &buf.view,
                         PyBUF_C_CONTIGUOUS | PyBUF_FORMAT) != 0) {
    return nullptr;
  }
  buf.ok = true;
  if (buf.view.ndim != 4 || buf.view.shape[3] != 3 ||
      buf.view.itemsize != 1) {
    PyErr_SetString(PyExc_ValueError,
                    "frames must be contiguous uint8 [T, H, W, 3]");
    return nullptr;
  }
  const int64_t T = buf.view.shape[0];
  const int64_t H = buf.view.shape[1];
  const int64_t W = buf.view.shape[2];
  if (top < 0 || left < 0 || top + crop_h > H || left + crop_w > W ||
      crop_h <= 0 || crop_w <= 0 || out_h <= 0 || out_w <= 0) {
    PyErr_SetString(PyExc_ValueError, "invalid crop window");
    return nullptr;
  }

  const int64_t plane = T * out_h * out_w;
  using OutT = typename Store::T;
  PyObject* out_bytes = PyBytes_FromStringAndSize(
      nullptr, static_cast<Py_ssize_t>(3 * plane * sizeof(OutT)));
  if (!out_bytes) return nullptr;
  OutT* dst = reinterpret_cast<OutT*>(PyBytes_AS_STRING(out_bytes));
  const uint8_t* src = static_cast<const uint8_t*>(buf.view.buf);

  const XCoef xc = MakeXCoef(crop_w, out_w);
  Py_BEGIN_ALLOW_THREADS
#ifdef _OPENMP
#pragma omp parallel
  {
    std::vector<float> scratch(2 * 3 * out_w);
#pragma omp for schedule(static)
    for (int64_t t = 0; t < T; ++t) {
      ResizeFrameCHW<Store>(src + t * H * W * 3, H, W, top, left, crop_h,
                            crop_w, out_h, out_w, dst + t * out_h * out_w,
                            plane, xc, scratch.data());
    }
  }
#else
  std::vector<float> scratch(2 * 3 * out_w);
  for (int64_t t = 0; t < T; ++t) {
    ResizeFrameCHW<Store>(src + t * H * W * 3, H, W, top, left, crop_h,
                          crop_w, out_h, out_w, dst + t * out_h * out_w, plane,
                          xc, scratch.data());
  }
#endif
  Py_END_ALLOW_THREADS

  return out_bytes;  // caller wraps via np.frombuffer(...).reshape(3,T,oh,ow)
}

PyObject* ResizeCropCHW(PyObject* /*self*/, PyObject* args) {
  return ResizeCropCHWImpl<StoreFloat01>(args);
}

PyObject* ResizeCropCHWU8(PyObject* /*self*/, PyObject* args) {
  return ResizeCropCHWImpl<StoreU8>(args);
}

PyMethodDef kMethods[] = {
    {"resize_crop_chw", ResizeCropCHW, METH_VARARGS,
     "Fused crop+bilinear-resize+normalize+CHW for a uint8 clip."},
    {"resize_crop_chw_u8", ResizeCropCHWU8, METH_VARARGS,
     "Fused crop+bilinear-resize+CHW for a uint8 clip; uint8 output."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "video_ops_native",
    "Native video transform ops", -1, kMethods,
};

}  // namespace

PyMODINIT_FUNC PyInit_video_ops_native(void) {
  return PyModule_Create(&kModule);
}
