// Model-level C ABI — native counterpart of the reference's
// src/visp/c-api.cpp:1-253 (visp_model_load / visp_model_compute /
// visp_model_destroy with opaque handles, thread-local error strings,
// int32 status codes).
//
// The reference's C API fronts a C++ engine; this framework's engine is the
// vision_tpu Python package running on XLA, so the shim embeds CPython and
// forwards to vision_tpu/capi.py, which does all marshalling with
// primitive types. Build: `make -C vision_tpu/native libvisp_capi.so`.
// Consumers dlopen the library, call visp_init("<repo-or-site-dir>") once,
// then use the visp_* calls from any thread (the GIL is acquired per call).

#include <Python.h>

#include <cstdint>
#include <cstring>
#include <string>

#define VISP_API __attribute__((visibility("default")))

namespace {

thread_local std::string g_error;

void set_error(const char* msg) {
    g_error = msg ? msg : "unknown error";
}

void set_error_from_python() {
    PyObject *type = nullptr, *value = nullptr, *trace = nullptr;
    PyErr_Fetch(&type, &value, &trace);
    PyErr_NormalizeException(&type, &value, &trace);
    if (value) {
        PyObject* s = PyObject_Str(value);
        if (s) {
            set_error(PyUnicode_AsUTF8(s));
            Py_DECREF(s);
        } else {
            set_error("python exception (unprintable)");
        }
    } else {
        set_error("python exception");
    }
    Py_XDECREF(type);
    Py_XDECREF(value);
    Py_XDECREF(trace);
}

PyObject* g_capi = nullptr;  // vision_tpu.capi module

struct GIL {
    PyGILState_STATE state;
    GIL() : state(PyGILState_Ensure()) {}
    ~GIL() { PyGILState_Release(state); }
};

PyObject* call(const char* fn, PyObject* args) {
    // takes ownership of args; returns new ref or nullptr with error set
    if (!g_capi) {
        Py_XDECREF(args);
        set_error("visp_init was not called");
        return nullptr;
    }
    PyObject* f = PyObject_GetAttrString(g_capi, fn);
    if (!f) {
        Py_XDECREF(args);
        set_error_from_python();
        return nullptr;
    }
    PyObject* r = PyObject_CallObject(f, args);
    Py_DECREF(f);
    Py_XDECREF(args);
    if (!r) set_error_from_python();
    return r;
}

}  // namespace

extern "C" {

struct visp_image_view {
    int32_t width;
    int32_t height;
    int32_t stride;  // bytes per row
    int32_t format;  // index into capi.FORMATS (reference image.h order)
    void* data;
};

// opaque handle types
typedef struct visp_device visp_device;   // PyObject* (Device)
typedef struct visp_model visp_model;     // PyObject* ((model, family) tuple)
typedef struct visp_image visp_image;     // PyObject* (u8 numpy buffer)

VISP_API const char* visp_get_last_error() {
    return g_error.c_str();
}

// Initialize the embedded interpreter and import vision_tpu from `dir`
// (the analog of the reference's visp_backend_load_all, c-api.cpp:160-163:
// there it loads backend DLLs from a directory; here the "backend" is the
// vision_tpu package + its XLA runtime). Returns 1 on success.
VISP_API int32_t visp_init(const char* dir) {
    if (!Py_IsInitialized()) {
        Py_InitializeEx(0);
        // Drop the GIL acquired by Py_Initialize so per-call GIL guards work.
        PyEval_SaveThread();
    }
    GIL gil;
    if (g_capi) return 1;
    if (dir && *dir) {
        PyObject* sys_path = PySys_GetObject("path");  // borrowed
        PyObject* p = PyUnicode_FromString(dir);
        if (sys_path && p) PyList_Insert(sys_path, 0, p);
        Py_XDECREF(p);
    }
    g_capi = PyImport_ImportModule("vision_tpu.capi");
    if (!g_capi) {
        set_error_from_python();
        return 0;
    }
    return 1;
}

// device

VISP_API int32_t visp_device_init(int32_t type, visp_device** out_device) {
    GIL gil;
    PyObject* r = call("device_init", Py_BuildValue("(i)", type));
    if (!r) return 0;
    *out_device = reinterpret_cast<visp_device*>(r);
    return 1;
}

VISP_API void visp_device_destroy(visp_device* d) {
    if (!d || !Py_IsInitialized()) return;
    GIL gil;
    Py_DECREF(reinterpret_cast<PyObject*>(d));
}

VISP_API int32_t visp_device_type(const visp_device* d) {
    GIL gil;
    PyObject* r = call("device_type", Py_BuildValue("(O)", reinterpret_cast<PyObject*>(const_cast<visp_device*>(d))));
    if (!r) return -1;
    long v = PyLong_AsLong(r);
    Py_DECREF(r);
    return (int32_t)v;
}

// models

VISP_API int32_t visp_model_detect_family(const char* filepath, int32_t* out_family) {
    GIL gil;
    PyObject* r = call("model_detect_family", Py_BuildValue("(s)", filepath));
    if (!r) return 0;
    *out_family = (int32_t)PyLong_AsLong(r);
    Py_DECREF(r);
    return 1;
}

VISP_API int32_t visp_model_load(
    const char* filepath, const visp_device* dev, int32_t family, visp_model** out) {
    GIL gil;
    PyObject* r = call(
        "model_load",
        Py_BuildValue("(sOi)", filepath, reinterpret_cast<PyObject*>(const_cast<visp_device*>(dev)), family));
    if (!r) return 0;
    *out = reinterpret_cast<visp_model*>(r);
    return 1;
}

VISP_API void visp_model_destroy(visp_model* model, int32_t /*family*/) {
    if (!model || !Py_IsInitialized()) return;
    GIL gil;
    Py_DECREF(reinterpret_cast<PyObject*>(model));
}

VISP_API void visp_image_destroy(visp_image* img) {
    if (!img || !Py_IsInitialized()) return;
    GIL gil;
    Py_DECREF(reinterpret_cast<PyObject*>(img));
}

// Run a model: `inputs` images are copied into the interpreter; the output
// image's pixels live in *out_data (visp_image handle) until
// visp_image_destroy (reference visp_model_compute, c-api.cpp:216-239).
VISP_API int32_t visp_model_compute(
    visp_model* model,
    int32_t /*family: carried inside the handle*/,
    const visp_image_view* inputs,
    int32_t n_inputs,
    const int32_t* args,
    int32_t n_args,
    visp_image_view* out_image,
    visp_image** out_data) {
    GIL gil;

    PyObject* images = PyList_New(n_inputs);
    for (int32_t i = 0; i < n_inputs; ++i) {
        const visp_image_view& v = inputs[i];
        PyObject* bytes = PyBytes_FromStringAndSize(
            reinterpret_cast<const char*>(v.data), (Py_ssize_t)v.stride * v.height);
        PyObject* tup = Py_BuildValue("(iiiiN)", v.width, v.height, v.stride, v.format, bytes);
        PyList_SET_ITEM(images, i, tup);
    }
    PyObject* py_args = PyList_New(n_args);
    for (int32_t i = 0; i < n_args; ++i) {
        PyList_SET_ITEM(py_args, i, PyLong_FromLong(args[i]));
    }

    PyObject* r = call(
        "model_compute",
        Py_BuildValue("(ONN)", reinterpret_cast<PyObject*>(model), images, py_args));
    if (!r) return 0;

    // r = (u8_buffer, width, height, stride, fmt)
    PyObject* buf = PyTuple_GetItem(r, 0);  // borrowed
    out_image->width = (int32_t)PyLong_AsLong(PyTuple_GetItem(r, 1));
    out_image->height = (int32_t)PyLong_AsLong(PyTuple_GetItem(r, 2));
    out_image->stride = (int32_t)PyLong_AsLong(PyTuple_GetItem(r, 3));
    out_image->format = (int32_t)PyLong_AsLong(PyTuple_GetItem(r, 4));

    Py_buffer view;
    if (PyObject_GetBuffer(buf, &view, PyBUF_SIMPLE) != 0) {
        set_error_from_python();
        Py_DECREF(r);
        return 0;
    }
    out_image->data = view.buf;
    PyBuffer_Release(&view);  // numpy keeps the memory alive while r lives
    *out_data = reinterpret_cast<visp_image*>(r);
    return 1;
}

}  // extern "C"
