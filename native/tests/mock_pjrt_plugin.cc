// Mock PJRT plugin for testing the native PJRT serving backend without
// TPU hardware (there is no CPU PJRT C-API plugin in the image; the
// real plugins are libtpu.so on TPU VMs / the axon tunnel plugin here).
//
// Implements exactly the API subset pjrt_backend.cc uses, with
// deterministic arithmetic "execution" the Python test replicates
// byte-for-byte:
//
//   - output j with a donation alias to argument i:
//       out_j[k] = (in_i[k] + 1) mod 256       (state buffers)
//   - any other output j (in_1 term only when a state input exists):
//       out_j[k] = (in_0[k mod |in_0|] xor (0x5A + j)) + in_1[k mod |in_1|]
//     The in_1 term makes the display output depend on the ROTATED STATE
//     CONTENTS: after t frames every in_1 byte equals t (zero-init state,
//     +1 per step via the alias rule), so a backend that fed stale or
//     re-created state buffers would be caught by byte comparison, and
//     reset() must visibly zero the term.
//
// Donation is enforced: executing with a buffer that was consumed by a
// previous execute (or already destroyed) is an INVALID_ARGUMENT error,
// so the test proves the backend rotates state buffers correctly frame
// after frame.  Shapes come from the same step_spec.txt the backend
// reads (env MOCK_PJRT_SPEC), standing in for the real plugin's
// knowledge of the compiled program signature.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <memory>
#include <string>
#include <vector>

#include "xla/pjrt/c/pjrt_c_api.h"

#include "../src/step_spec.h"

namespace {

using JoshUpscale::core::StepSpec;
using JoshUpscale::core::TensorSpec;
using JoshUpscale::core::parseStepSpec;

struct Error {
  std::string message;
};

Error *makeError(const std::string &message) { return new Error{message}; }

// Optional call trace (env MOCK_PJRT_TRACE=path): one line per
// execute / D2H start / D2H-event await, tagged with the execute
// sequence number the display buffer came from.  Tests use it to prove
// CALL ORDERING -- e.g. that the pipelined backend enqueues execute
// t+1 before awaiting frame t's D2H event.
std::FILE *traceFile() {
  static std::FILE *f = [] {
    const char *path = std::getenv("MOCK_PJRT_TRACE");
    return path != nullptr ? std::fopen(path, "a") : nullptr;
  }();
  return f;
}

void trace(const char *what, int seq) {
  if (std::FILE *f = traceFile()) {
    std::fprintf(f, "%s %d\n", what, seq);
    std::fflush(f);
  }
}

int g_execCount = 0;

struct Buffer {
  TensorSpec spec;
  std::vector<std::uint8_t> bytes;
  bool consumed = false;  // donated to an execute
  int execSeq = -1;       // which execute produced it (display outputs)
  // Device layout of `bytes`: row-major (host order), or fully
  // reversed minor-to-major (first logical axis fastest-varying).
  // Real TPU plugins pick the reversed layout for the u8 display
  // output (measured on the axon plugin), so the mock stores
  // non-aliased executable outputs that way: a backend that fails to
  // request an explicit row-major host_layout in ToHostBuffer reads
  // scrambled frames, exactly like on hardware.
  bool reversedLayout = false;
};

// Map a row-major byte image of `spec` into reversed-minor-to-major
// storage (forward=true) or back (forward=false).
std::vector<std::uint8_t> convertReversed(
    const std::vector<std::uint8_t> &src, const TensorSpec &spec,
    bool toReversed) {
  const std::size_t n = spec.dims.size();
  const std::size_t elem = JoshUpscale::core::dtypeSize(spec.dtype);
  std::vector<std::uint8_t> dst(src.size());
  if (n < 2) {
    return src;
  }
  // Reversed-layout element strides: first logical axis is minor.
  std::vector<std::size_t> fstride(n);
  fstride[0] = 1;
  for (std::size_t j = 1; j < n; ++j) {
    fstride[j] =
        fstride[j - 1] * static_cast<std::size_t>(spec.dims[j - 1]);
  }
  std::vector<std::size_t> idx(n, 0);
  const std::size_t count = spec.numElements();
  for (std::size_t k = 0; k < count; ++k) {
    std::size_t off = 0;
    for (std::size_t j = 0; j < n; ++j) {
      off += idx[j] * fstride[j];
    }
    const std::size_t a = k * elem;
    const std::size_t b = off * elem;
    if (toReversed) {
      std::memcpy(&dst[b], &src[a], elem);
    } else {
      std::memcpy(&dst[a], &src[b], elem);
    }
    for (std::size_t j = n; j-- > 0;) {  // advance row-major counter
      if (++idx[j] < static_cast<std::size_t>(spec.dims[j])) {
        break;
      }
      idx[j] = 0;
    }
  }
  return dst;
}

// True iff `layout` describes a dense row-major layout for `spec`.
// Like the real TPU plugins (measured on the axon plugin; jaxlib's
// ToLiteral path always sends Tiled), ONLY the tiled form with
// descending minor_to_major and no tiles is accepted.
bool isDenseRowMajor(const PJRT_Buffer_MemoryLayout *layout,
                     const TensorSpec &spec) {
  if (layout->type != PJRT_Buffer_MemoryLayout_Type_Tiled) {
    return false;
  }
  const auto &tiled = layout->tiled;
  if (tiled.num_tiles != 0 ||
      tiled.minor_to_major_size != spec.dims.size()) {
    return false;
  }
  for (std::size_t i = 0; i < tiled.minor_to_major_size; ++i) {
    if (tiled.minor_to_major[i] !=
        static_cast<std::int64_t>(spec.dims.size() - 1 - i)) {
      return false;
    }
  }
  return true;
}

struct Client {
  StepSpec spec;
  int fakeDevice = 0;  // PJRT_Device* points here
  // Per-client device list: a function-local static in
  // AddressableDevices would cache the FIRST client's pointer and
  // hand later clients a stale/dangling device.
  PJRT_Device *devices[1] = {nullptr};
};

struct Executable {
  Client *client;
};

struct Event {
  Error *error = nullptr;  // owned until Await hands it over
  int traceSeq = -1;       // execute seq for D2H events (-1 = untraced)
  // Deferred D2H: like the real plugin, ToHostBuffer only ENQUEUES the
  // copy -- the bytes land in dst when the event completes (here: at
  // Await).  A caller that snapshots/frees its dst buffer before
  // awaiting reads stale bytes, exactly the failure measured on the
  // axon plugin (processAsync copy-instead-of-move bug).
  std::vector<std::uint8_t> deferredSrc;
  void *deferredDst = nullptr;
};

}  // namespace

// PJRT opaque types are only forward-declared in the C API header, so
// the mock defines them as wrappers of the structs above.
struct PJRT_Error {
  Error impl;
};
struct PJRT_Buffer {
  Buffer impl;
};
struct PJRT_Client {
  Client impl;
};
struct PJRT_LoadedExecutable {
  Executable impl;
};
struct PJRT_Event {
  Event impl;
};

namespace {

PJRT_Error *wrap(Error *e) {
  if (e == nullptr) {
    return nullptr;
  }
  auto *r = new PJRT_Error{{std::move(e->message)}};
  delete e;
  return r;
}

void errorDestroy(PJRT_Error_Destroy_Args *args) { delete args->error; }

void errorMessage(PJRT_Error_Message_Args *args) {
  args->message = args->error->impl.message.c_str();
  args->message_size = args->error->impl.message.size();
}

PJRT_Error *errorGetCode(PJRT_Error_GetCode_Args *args) {
  args->code = PJRT_Error_Code_INVALID_ARGUMENT;
  return nullptr;
}

PJRT_Error *pluginInitialize(PJRT_Plugin_Initialize_Args *) {
  return nullptr;
}

PJRT_Error *clientCreate(PJRT_Client_Create_Args *args) {
  const char *specPath = std::getenv("MOCK_PJRT_SPEC");
  if (specPath == nullptr) {
    return wrap(makeError("MOCK_PJRT_SPEC is not set"));
  }
  try {
    auto *client = new PJRT_Client;
    client->impl.spec = parseStepSpec(specPath);
    args->client = client;
    return nullptr;
  } catch (const std::exception &e) {
    return wrap(makeError(e.what()));
  }
}

PJRT_Error *clientDestroy(PJRT_Client_Destroy_Args *args) {
  delete args->client;
  return nullptr;
}

PJRT_Error *clientAddressableDevices(
    PJRT_Client_AddressableDevices_Args *args) {
  // One fake device per client; the pointer just needs to be stable
  // (for the client's lifetime) and non-null.
  auto &impl = args->client->impl;
  impl.devices[0] = reinterpret_cast<PJRT_Device *>(&impl.fakeDevice);
  args->addressable_devices = impl.devices;
  args->num_addressable_devices = 1;
  return nullptr;
}

PJRT_Error *clientCompile(PJRT_Client_Compile_Args *args) {
  if (args->program == nullptr || args->program->code_size == 0) {
    return wrap(makeError("empty program"));
  }
  std::string format(args->program->format, args->program->format_size);
  if (format != "mlir") {
    return wrap(makeError("mock plugin only accepts mlir, got " + format));
  }
  // A real plugin would also parse compile_options
  // (xla.CompileOptionsProto); the mock only checks it is present.
  if (args->compile_options_size == 0) {
    return wrap(makeError("missing compile options"));
  }
  auto *exe = new PJRT_LoadedExecutable;
  exe->impl.client = &args->client->impl;
  args->executable = exe;
  return nullptr;
}

PJRT_Error *bufferFromHostBuffer(
    PJRT_Client_BufferFromHostBuffer_Args *args) {
  if (args->byte_strides != nullptr && args->num_byte_strides != 0) {
    return wrap(makeError("mock plugin requires dense layout"));
  }
  auto *buffer = new PJRT_Buffer;
  TensorSpec spec;
  switch (args->type) {
    case PJRT_Buffer_Type_U8:
      spec.dtype = JoshUpscale::core::DType::kU8;
      break;
    case PJRT_Buffer_Type_F32:
      spec.dtype = JoshUpscale::core::DType::kF32;
      break;
    case PJRT_Buffer_Type_BF16:
      spec.dtype = JoshUpscale::core::DType::kBF16;
      break;
    case PJRT_Buffer_Type_F16:
      spec.dtype = JoshUpscale::core::DType::kF16;
      break;
    case PJRT_Buffer_Type_S32:
      spec.dtype = JoshUpscale::core::DType::kI32;
      break;
    default:
      delete buffer;
      return wrap(makeError("unsupported buffer type"));
  }
  spec.dims.assign(args->dims, args->dims + args->num_dims);
  buffer->impl.spec = spec;
  const auto *data = static_cast<const std::uint8_t *>(args->data);
  buffer->impl.bytes.assign(data, data + spec.byteSize());
  args->buffer = buffer;
  args->done_with_host_buffer = new PJRT_Event;
  return nullptr;
}

PJRT_Error *loadedExecutableDestroy(
    PJRT_LoadedExecutable_Destroy_Args *args) {
  delete args->executable;
  return nullptr;
}

PJRT_Error *loadedExecutableExecute(
    PJRT_LoadedExecutable_Execute_Args *args) {
  const StepSpec &spec = args->executable->impl.client->spec;
  if (args->num_devices != 1) {
    return wrap(makeError("mock plugin is single-device"));
  }
  if (args->num_args != spec.inputs.size()) {
    return wrap(makeError("argument count mismatch"));
  }
  PJRT_Buffer *const *argList = args->argument_lists[0];
  for (std::size_t i = 0; i < args->num_args; ++i) {
    const Buffer &in = argList[i]->impl;
    if (in.consumed) {
      return wrap(makeError("argument " + std::to_string(i) +
                            " was already donated"));
    }
    if (in.bytes.size() != spec.inputs[i].byteSize()) {
      return wrap(makeError("argument " + std::to_string(i) +
                            " size mismatch"));
    }
  }
  const int execSeq = g_execCount++;
  trace("exec", execSeq);
  const std::vector<std::uint8_t> &in0 = argList[0]->impl.bytes;
  for (std::size_t j = 0; j < spec.outputs.size(); ++j) {
    int aliasArg = -1;
    for (const auto &[out, arg] : spec.aliases) {
      if (static_cast<std::size_t>(out) == j) {
        aliasArg = arg;
      }
    }
    auto *buffer = new PJRT_Buffer;
    buffer->impl.spec = spec.outputs[j];
    std::vector<std::uint8_t> &out = buffer->impl.bytes;
    out.resize(spec.outputs[j].byteSize());
    if (aliasArg >= 0) {
      const std::vector<std::uint8_t> &src = argList[aliasArg]->impl.bytes;
      for (std::size_t k = 0; k < out.size(); ++k) {
        out[k] = static_cast<std::uint8_t>(src[k] + 1);
      }
      argList[aliasArg]->impl.consumed = true;  // donated
    } else {
      for (std::size_t k = 0; k < out.size(); ++k) {
        out[k] = static_cast<std::uint8_t>(in0[k % in0.size()] ^
                                           (0x5A + j));
      }
      if (args->num_args > 1) {
        const std::vector<std::uint8_t> &in1 = argList[1]->impl.bytes;
        for (std::size_t k = 0; k < out.size(); ++k) {
          out[k] = static_cast<std::uint8_t>(out[k] +
                                             in1[k % in1.size()]);
        }
      }
      // Store display-style outputs in the reversed device layout
      // (see Buffer::reversedLayout) so ToHostBuffer must convert.
      out = convertReversed(out, spec.outputs[j], /*toReversed=*/true);
      buffer->impl.reversedLayout = true;
      buffer->impl.execSeq = execSeq;
    }
    args->output_lists[0][j] = buffer;
  }
  if (args->device_complete_events != nullptr) {
    args->device_complete_events[0] = new PJRT_Event;
  }
  return nullptr;
}

PJRT_Error *bufferDestroy(PJRT_Buffer_Destroy_Args *args) {
  delete args->buffer;
  return nullptr;
}

PJRT_Error *bufferToHostBuffer(PJRT_Buffer_ToHostBuffer_Args *args) {
  const Buffer &src = args->src->impl;
  if (args->dst == nullptr) {
    args->dst_size = src.bytes.size();
    return nullptr;
  }
  if (args->dst_size < src.bytes.size()) {
    return wrap(makeError("destination too small"));
  }
  std::vector<std::uint8_t> payload;
  if (args->host_layout == nullptr) {
    // Per the C API contract, a null host_layout copies in the SOURCE
    // buffer's layout -- for reversed-layout device buffers that hands
    // the caller scrambled bytes, exactly like the real TPU plugin.
    payload = src.bytes;
  } else if (isDenseRowMajor(args->host_layout, src.spec)) {
    payload = src.reversedLayout
                  ? convertReversed(src.bytes, src.spec,
                                    /*toReversed=*/false)
                  : src.bytes;
  } else {
    return wrap(makeError(
        "mock plugin only supports dense row-major host_layout"));
  }
  // DEFERRED copy: enqueue only; the bytes land in dst at event
  // completion (Await), like the real plugin's DMA.  Callers that
  // read/snapshot/free dst before awaiting the event are buggy and
  // this makes the suite catch them.
  args->event = new PJRT_Event;
  args->event->impl.deferredSrc = std::move(payload);
  args->event->impl.deferredDst = args->dst;
  if (src.execSeq >= 0) {
    trace("tohost", src.execSeq);
    args->event->impl.traceSeq = src.execSeq;
  }
  return nullptr;
}

PJRT_Error *eventDestroy(PJRT_Event_Destroy_Args *args) {
  delete args->event;
  return nullptr;
}

PJRT_Error *eventAwait(PJRT_Event_Await_Args *args) {
  if (args->event->impl.traceSeq >= 0) {
    trace("await_tohost", args->event->impl.traceSeq);
  }
  Event &impl = args->event->impl;
  if (impl.deferredDst != nullptr) {
    std::memcpy(impl.deferredDst, impl.deferredSrc.data(),
                impl.deferredSrc.size());
    impl.deferredDst = nullptr;
  }
  Error *e = impl.error;
  impl.error = nullptr;
  return wrap(e);
}

}  // namespace

extern "C" const PJRT_Api *GetPjrtApi() {
  static PJRT_Api api = [] {
    PJRT_Api a;
    std::memset(&a, 0, sizeof(a));
    a.struct_size = PJRT_Api_STRUCT_SIZE;
    a.pjrt_api_version.struct_size = PJRT_Api_Version_STRUCT_SIZE;
    a.pjrt_api_version.major_version = PJRT_API_MAJOR;
    a.pjrt_api_version.minor_version = PJRT_API_MINOR;
    a.PJRT_Error_Destroy = errorDestroy;
    a.PJRT_Error_Message = errorMessage;
    a.PJRT_Error_GetCode = errorGetCode;
    a.PJRT_Plugin_Initialize = pluginInitialize;
    a.PJRT_Client_Create = clientCreate;
    a.PJRT_Client_Destroy = clientDestroy;
    a.PJRT_Client_AddressableDevices = clientAddressableDevices;
    a.PJRT_Client_Compile = clientCompile;
    a.PJRT_Client_BufferFromHostBuffer = bufferFromHostBuffer;
    a.PJRT_LoadedExecutable_Destroy = loadedExecutableDestroy;
    a.PJRT_LoadedExecutable_Execute = loadedExecutableExecute;
    a.PJRT_Buffer_Destroy = bufferDestroy;
    a.PJRT_Buffer_ToHostBuffer = bufferToHostBuffer;
    a.PJRT_Event_Destroy = eventDestroy;
    a.PJRT_Event_Await = eventAwait;
    return a;
  }();
  return &api;
}
