// Embedded CPython bridge to the XLA engine (see python_backend.h).

#include "python_backend.h"

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <mutex>
#include <stdexcept>

#include "logging.h"

namespace JoshUpscale {
namespace core {

namespace {

// One interpreter per process, initialized lazily and never finalized
// (JAX runtimes do not support re-initialization).
void ensureInterpreter() {
  static std::once_flag once;
  std::call_once(once, [] {
    if (Py_IsInitialized() == 0) {
      PyConfig config;
      PyConfig_InitPythonConfig(&config);
      Py_InitializeFromConfig(&config);
      PyConfig_Clear(&config);
      // Release the GIL so worker threads can take it per call.
      PyEval_SaveThread();
    }
  });
}

class GilGuard {
 public:
  GilGuard() : m_state(PyGILState_Ensure()) {}
  ~GilGuard() { PyGILState_Release(m_state); }

 private:
  PyGILState_STATE m_state;
};

[[noreturn]] void throwPythonError(const char *context) {
  std::string message = context;
  PyObject *type = nullptr;
  PyObject *value = nullptr;
  PyObject *trace = nullptr;
  PyErr_Fetch(&type, &value, &trace);
  PyErr_NormalizeException(&type, &value, &trace);
  if (value != nullptr) {
    PyObject *str = PyObject_Str(value);
    if (str != nullptr) {
      const char *text = PyUnicode_AsUTF8(str);
      if (text != nullptr) {
        message += ": ";
        message += text;
      }
      Py_DECREF(str);
    }
  }
  Py_XDECREF(type);
  Py_XDECREF(value);
  Py_XDECREF(trace);
  throw std::runtime_error(message);
}

std::size_t getSizeAttr(PyObject *obj, const char *name) {
  PyObject *attr = PyObject_GetAttrString(obj, name);
  if (attr == nullptr) {
    throwPythonError("Missing engine attribute");
  }
  long long v = PyLong_AsLongLong(attr);
  Py_DECREF(attr);
  if (v < 0) {
    throwPythonError("Invalid engine attribute");
  }
  return static_cast<std::size_t>(v);
}

}  // namespace

PythonEngine::PythonEngine(int deviceId, const std::string &modelPath) {
  ensureInterpreter();
  GilGuard gil;
  PyObject *module =
      PyImport_ImportModule("joshupscale_tpu.runtime.native_glue");
  if (module == nullptr) {
    throwPythonError("Cannot import joshupscale_tpu.runtime.native_glue");
  }
  PyObject *engine = PyObject_CallMethod(
      module, "NativeEngine", "si", modelPath.c_str(), deviceId);
  Py_DECREF(module);
  if (engine == nullptr) {
    throwPythonError("Engine construction failed");
  }
  m_engine = engine;
  try {
    m_inputWidth = getSizeAttr(engine, "input_width");
    m_inputHeight = getSizeAttr(engine, "input_height");
    m_outputWidth = getSizeAttr(engine, "output_width");
    m_outputHeight = getSizeAttr(engine, "output_height");
  } catch (...) {
    // The destructor never runs for a partially constructed object:
    // without this, a bad size attribute leaks the live engine (its
    // jitted executables and device buffers) on every failed retry --
    // the same class the PjrtEngine constructor already guards.
    Py_DECREF(engine);
    m_engine = nullptr;
    throw;
  }
  JOSHUPSCALE_LOG_INFO << "engine loaded: " << modelPath << " ("
                       << m_inputWidth << 'x' << m_inputHeight << " -> "
                       << m_outputWidth << 'x' << m_outputHeight << ')';
}

PythonEngine::~PythonEngine() {
  if (m_engine != nullptr) {
    GilGuard gil;
    Py_DECREF(static_cast<PyObject *>(m_engine));
  }
}

void PythonEngine::process(const std::uint8_t *in, std::size_t inSize,
                           std::vector<std::uint8_t> *out) {
  GilGuard gil;
  PyObject *result = PyObject_CallMethod(
      static_cast<PyObject *>(m_engine), "process_bytes", "y#",
      reinterpret_cast<const char *>(in),
      static_cast<Py_ssize_t>(inSize));
  if (result == nullptr) {
    throwPythonError("process failed");
  }
  char *buffer = nullptr;
  Py_ssize_t size = 0;
  if (PyBytes_AsStringAndSize(result, &buffer, &size) != 0) {
    Py_DECREF(result);
    throwPythonError("process returned a non-bytes value");
  }
  out->assign(buffer, buffer + size);
  Py_DECREF(result);
}

void PythonEngine::reset() {
  GilGuard gil;
  PyObject *result = PyObject_CallMethod(
      static_cast<PyObject *>(m_engine), "reset", nullptr);
  if (result == nullptr) {
    throwPythonError("reset failed");
  }
  Py_DECREF(result);
}

}  // namespace core
}  // namespace JoshUpscale
