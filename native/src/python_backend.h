// Embedded-Python XLA engine backend.
//
// The reference's backend deserializes a TensorRT engine and launches
// pre-captured CUDA graphs (core/src/tensorrt_backend.cc).  The
// TPU-native equivalent drives the jitted XLA engine through an
// embedded CPython interpreter: model math runs entirely on the TPU via
// XLA with donated recurrent state; this layer only moves contiguous
// uint8 frames across the language boundary (bytes ABI, see
// joshupscale_tpu/runtime/native_glue.py).

#ifndef JOSHUPSCALE_SRC_PYTHON_BACKEND_H_
#define JOSHUPSCALE_SRC_PYTHON_BACKEND_H_

#include <cstdint>
#include <string>
#include <vector>

#include "backend.h"

namespace JoshUpscale {
namespace core {

class PythonEngine final : public Backend {
 public:
  PythonEngine(int deviceId, const std::string &modelPath);
  ~PythonEngine() override;

  PythonEngine(const PythonEngine &) = delete;
  PythonEngine &operator=(const PythonEngine &) = delete;

  // in: H*W*3 BGR bytes; out is resized to 4H*4W*3.
  void process(const std::uint8_t *in, std::size_t inSize,
               std::vector<std::uint8_t> *out) override;
  void reset() override;

  std::size_t inputWidth() const noexcept override { return m_inputWidth; }
  std::size_t inputHeight() const noexcept override { return m_inputHeight; }
  std::size_t outputWidth() const noexcept override { return m_outputWidth; }
  std::size_t outputHeight() const noexcept override {
    return m_outputHeight;
  }

 private:
  void *m_engine = nullptr;  // PyObject*
  std::size_t m_inputWidth = 0;
  std::size_t m_inputHeight = 0;
  std::size_t m_outputWidth = 0;
  std::size_t m_outputHeight = 0;
};

}  // namespace core
}  // namespace JoshUpscale

#endif  // JOSHUPSCALE_SRC_PYTHON_BACKEND_H_
