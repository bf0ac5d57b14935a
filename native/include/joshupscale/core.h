// JoshUpscale TPU-native host runtime — public C++ API.
//
// ABI parity with the reference core/public/JoshUpscale/core.h: Image,
// DataLocation, Runtime with processImage + dimension getters,
// createRuntime(deviceId, modelPath), pluggable LogSink, and
// getExceptionString for error reporting.  Redesigned for TPU serving:
// the backend is an embedded-Python XLA engine (recurrent state stays in
// device HBM via buffer donation) instead of a TensorRT context pair,
// and graphics-API interop (D3D11/GL texture registration) is replaced
// by host-memory frames — TPUs have no shared-texture path, so plugin
// shims hand over CPU frames and overlap transfer with compute inside
// the engine.

#ifndef JOSHUPSCALE_CORE_H_
#define JOSHUPSCALE_CORE_H_

#include <cstddef>
#include <cstdint>
#include <string>

namespace JoshUpscale {
namespace core {

// Frame location. Only CPU host memory is meaningful for a TPU backend
// (reference also has CUDA and GRAPHICS_RESOURCE).
enum class DataLocation : int {
  CPU = 0,
};

// A view over one interleaved BGR24 frame. `stride` is in bytes and may
// be negative for bottom-up frames (AviSynth convention, reference
// avisynth_plugin/src/main.cc:125-142).
struct Image {
  void *ptr = nullptr;
  DataLocation location = DataLocation::CPU;
  std::ptrdiff_t stride = 0;
  std::size_t width = 0;
  std::size_t height = 0;
};

// Log sink interface (reference core.h:21-28).
enum class LogLevel : int { INFO = 0, WARNING = 1, ERROR = 2 };

struct LogSink {
  virtual ~LogSink() = default;
  virtual void log(LogLevel level, const char *message) noexcept = 0;
};

// Replace the process-wide log sink (nullptr restores the console sink).
void setLogSink(LogSink *sink) noexcept;

// Runtime: one recurrent upscale stream with on-device state.
class Runtime {
 public:
  virtual ~Runtime() = default;

  // Upscale one frame. Recurrent state advances by one step.
  // Throws std::runtime_error on dimension/location mismatch.
  virtual void processImage(const Image &in, const Image &out) = 0;

  // Pipelined serving: submit `in` and, if a PREVIOUSLY submitted
  // frame's output has been collected, fill `out` with it and return
  // true (outputs arrive in submission order).  Backends with a
  // 1-deep in-flight queue overlap the host<->device transfer of
  // frame t+1 with the device compute of frame t, at the cost of one
  // frame of latency; backends without one degenerate to the
  // synchronous path (always true).  Do not interleave with
  // processImage on the same runtime; call flushImage to drain.
  virtual bool processImageAsync(const Image &in, const Image &out) {
    processImage(in, out);
    return true;
  }

  // Drain the pipeline: fill `out` with the last in-flight frame and
  // return true, or return false when nothing is pending.
  virtual bool flushImage(const Image &out) {
    (void)out;
    return false;
  }

  // Zero the recurrent state (stream restart / seek).
  virtual void reset() = 0;

  virtual std::size_t getInputWidth() const noexcept = 0;
  virtual std::size_t getInputHeight() const noexcept = 0;
  virtual std::size_t getOutputWidth() const noexcept = 0;
  virtual std::size_t getOutputHeight() const noexcept = 0;
};

// Create a runtime for `modelPath` (a package directory produced by
// joshupscale_tpu.export.package) on device `deviceId`.
// Caller owns the returned pointer.
Runtime *createRuntime(int deviceId, const char *modelPath);

// Human-readable description of the in-flight exception, including
// nested causes (reference core/src/exception.cc).
std::string getExceptionString();

}  // namespace core
}  // namespace JoshUpscale

#endif  // JOSHUPSCALE_CORE_H_
