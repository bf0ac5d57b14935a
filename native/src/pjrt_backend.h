// Python-free serving backend over the PJRT C API.
//
// Loads a PJRT plugin (.so exporting GetPjrtApi -- libtpu.so on a TPU
// VM, libaxon_pjrt.so through this box's tunnel, or the in-repo mock
// for tests), compiles the package's weight-embedded StableHLO module
// (step.mlir) and runs the recurrent frame loop with donated state
// buffers: the compiled executable carries input/output aliases from
// the export's tf.aliasing_output attributes, so the state ping-pongs
// in device memory with zero copies -- the TPU-native analog of the
// reference's double-buffered TensorRT execution contexts
// (core/src/tensorrt_backend.cc:222-278), with no embedded interpreter
// anywhere in the process.

#ifndef JOSHUPSCALE_SRC_PJRT_BACKEND_H_
#define JOSHUPSCALE_SRC_PJRT_BACKEND_H_

#include <cstdint>
#include <string>
#include <vector>

#include "backend.h"
#include "step_spec.h"

// Opaque PJRT types (defined by the C API header in the .cc only).
typedef struct PJRT_Api PJRT_Api;
typedef struct PJRT_Client PJRT_Client;
typedef struct PJRT_Device PJRT_Device;
typedef struct PJRT_LoadedExecutable PJRT_LoadedExecutable;
typedef struct PJRT_Buffer PJRT_Buffer;

namespace JoshUpscale {
namespace core {

class PjrtEngine final : public Backend {
 public:
  // pluginPath: PJRT plugin .so.  modelPath: package directory holding
  // step.mlir / step_spec.txt / state_init.bin / compile_options.pb.
  // optionsPath: optional key=value file of PJRT_Client_Create named
  // options (empty = none; real TPU VMs need none, the axon tunnel
  // plugin needs topology/session options -- see
  // tools/make_axon_pjrt_options.py).
  PjrtEngine(const std::string &pluginPath, const std::string &modelPath,
             int deviceId, const std::string &optionsPath = {});
  ~PjrtEngine() override;

  PjrtEngine(const PjrtEngine &) = delete;
  PjrtEngine &operator=(const PjrtEngine &) = delete;

  void process(const std::uint8_t *in, std::size_t inSize,
               std::vector<std::uint8_t> *out) override;

  // 1-deep in-flight pipeline: submit frame t+1 (host->HBM upload +
  // execute enqueue + non-blocking D2H start) BEFORE blocking on frame
  // t's D2H completion, so the transfer of one frame overlaps the
  // device compute of the next -- the native analog of the Python
  // engine's process_async double buffering (SURVEY §7's "async
  // dispatch + double-buffered transfers" hard-part; the reference's
  // TensorRT backend syncs per frame, core/src/tensorrt_backend.cc:
  // 270-278).  One frame of added latency; outputs in order.
  bool processAsync(const std::uint8_t *in, std::size_t inSize,
                    std::vector<std::uint8_t> *out) override;
  bool flush(std::vector<std::uint8_t> *out) override;

  void reset() override;

  std::size_t inputWidth() const noexcept override {
    return m_spec.frameWidth;
  }
  std::size_t inputHeight() const noexcept override {
    return m_spec.frameHeight;
  }
  std::size_t outputWidth() const noexcept override {
    return m_spec.frameWidth * m_spec.scale;
  }
  std::size_t outputHeight() const noexcept override {
    return m_spec.frameHeight * m_spec.scale;
  }

 private:
  // One in-flight display frame: its device buffer, the (possibly
  // still running) D2H copy's completion event, and the host bytes
  // the copy lands in.
  struct Pending {
    bool active = false;
    PJRT_Buffer *buffer = nullptr;
    void *event = nullptr;  // PJRT_Event*
    std::vector<std::uint8_t> host;
  };

  void construct(const std::string &pluginPath,
                 const std::string &modelPath, int deviceId,
                 const std::string &optionsPath);
  void check(void *error, const char *what) const;
  PJRT_Buffer *bufferFromHost(const void *data, const TensorSpec &t);
  void initState();
  void destroyState() noexcept;
  void cleanup() noexcept;
  void destroyBuffer(PJRT_Buffer *buffer) const noexcept;
  // Upload `in`, enqueue the execute, rotate the state buffers, and
  // start the non-blocking D2H of the display output into `pending`.
  void submit(const std::uint8_t *in, std::size_t inSize,
              Pending *pending);
  // Block until `pending`'s D2H completes and hand its bytes to `out`.
  bool awaitPending(Pending *pending, std::vector<std::uint8_t> *out);
  void dropPending() noexcept;

  void *m_dl = nullptr;
  const PJRT_Api *m_api = nullptr;
  PJRT_Client *m_client = nullptr;
  PJRT_Device *m_device = nullptr;
  PJRT_LoadedExecutable *m_exe = nullptr;
  StepSpec m_spec;
  std::vector<std::uint8_t> m_stateInit;      // state_init.bin contents
  std::vector<PJRT_Buffer *> m_state;         // live buffers for inputs[1:]
  Pending m_pending;                          // processAsync in-flight slot
};

}  // namespace core
}  // namespace JoshUpscale

#endif  // JOSHUPSCALE_SRC_PJRT_BACKEND_H_
