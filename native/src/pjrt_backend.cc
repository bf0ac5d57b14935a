// PJRT C API serving backend (see pjrt_backend.h).
//
// ABI note: this file compiles against the PJRT C API header found in
// the build environment (API 0.x).  The PJRT C ABI is append-only --
// struct fields and api-table entries are only ever added -- so a
// client built against a newer header drives an older plugin correctly
// as long as it (a) zero-initializes every args struct, (b) only calls
// functions the plugin's table actually provides (checked at load time
// against api->struct_size), and (c) never reads output fields newer
// than the plugin.  All three are observed here.

#include "pjrt_backend.h"

#include <dlfcn.h>

#include <cstddef>
#include <cstring>
#include <fstream>
#include <memory>
#include <sstream>
#include <stdexcept>
#include <type_traits>

#include "xla/pjrt/c/pjrt_c_api.h"

#include "logging.h"

namespace JoshUpscale {
namespace core {

namespace {

std::string readFile(const std::string &path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    throw std::runtime_error("Cannot open " + path);
  }
  std::ostringstream ss;
  ss << f.rdbuf();
  return ss.str();
}

PJRT_Buffer_Type toPjrtType(DType t) {
  switch (t) {
    case DType::kU8: return PJRT_Buffer_Type_U8;
    case DType::kF32: return PJRT_Buffer_Type_F32;
    case DType::kBF16: return PJRT_Buffer_Type_BF16;
    case DType::kF16: return PJRT_Buffer_Type_F16;
    case DType::kI32: return PJRT_Buffer_Type_S32;
    case DType::kF64: return PJRT_Buffer_Type_F64;
  }
  throw std::runtime_error("Unknown dtype");
}

// Named options for PJRT_Client_Create, parsed from a key=value file:
// one option per line, "name=s:stringvalue", "name=i:123", "name=b:1",
// "name=f:0.5".  Blank lines and #-comments are skipped.  Owns the
// string storage the PJRT_NamedValue entries point into.
struct ClientOptions {
  std::vector<std::string> storage;
  std::vector<PJRT_NamedValue> values;

  explicit ClientOptions(const std::string &path) {
    if (path.empty()) {
      return;
    }
    std::ifstream f(path);
    if (!f) {
      throw std::runtime_error("Cannot open PJRT options file: " + path);
    }
    // Two-pass: collect storage first so c_str() pointers stay stable.
    std::vector<std::pair<std::string, std::string>> raw;
    std::string line;
    while (std::getline(f, line)) {
      if (line.empty() || line[0] == '#') {
        continue;
      }
      auto eq = line.find('=');
      if (eq == std::string::npos || eq + 2 >= line.size() ||
          line[eq + 2] != ':') {
        throw std::runtime_error("Malformed PJRT option line: " + line);
      }
      raw.emplace_back(line.substr(0, eq), line.substr(eq + 1));
    }
    storage.reserve(raw.size() * 2);
    for (auto &[name, typedValue] : raw) {
      storage.push_back(name);
      const std::string &nameRef = storage.back();
      char type = typedValue[0];
      std::string value = typedValue.substr(2);
      PJRT_NamedValue nv;
      std::memset(&nv, 0, sizeof(nv));
      nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
      nv.name = nameRef.c_str();
      nv.name_size = nameRef.size();
      nv.value_size = 1;
      switch (type) {
        case 's': {
          storage.push_back(value);
          nv.type = PJRT_NamedValue_kString;
          nv.string_value = storage.back().c_str();
          nv.value_size = storage.back().size();
          break;
        }
        case 'i':
          nv.type = PJRT_NamedValue_kInt64;
          try {
            nv.int64_value = std::stoll(value);
          } catch (const std::exception &) {
            // A bare "stoll" exception gives no hint WHICH option
            // file/line is bad.
            throw std::runtime_error("Bad int in PJRT option " +
                                     nameRef + "=i:" + value);
          }
          break;
        case 'b':
          nv.type = PJRT_NamedValue_kBool;
          nv.bool_value = value == "1" || value == "true";
          break;
        case 'f':
          nv.type = PJRT_NamedValue_kFloat;
          try {
            nv.float_value = std::stof(value);
          } catch (const std::exception &) {
            throw std::runtime_error("Bad float in PJRT option " +
                                     nameRef + "=f:" + value);
          }
          break;
        default:
          throw std::runtime_error(
              std::string("Unknown PJRT option type '") + type + "'");
      }
      values.push_back(nv);
    }
  }
};

}  // namespace

void PjrtEngine::check(void *error, const char *what) const {
  if (error == nullptr) {
    return;
  }
  auto *err = static_cast<PJRT_Error *>(error);
  std::string message = what;
  PJRT_Error_Message_Args msgArgs;
  std::memset(&msgArgs, 0, sizeof(msgArgs));
  msgArgs.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  msgArgs.error = err;
  m_api->PJRT_Error_Message(&msgArgs);
  if (msgArgs.message != nullptr && msgArgs.message_size != 0) {
    message += ": ";
    message.append(msgArgs.message, msgArgs.message_size);
  }
  PJRT_Error_Destroy_Args destroyArgs;
  std::memset(&destroyArgs, 0, sizeof(destroyArgs));
  destroyArgs.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  destroyArgs.error = err;
  m_api->PJRT_Error_Destroy(&destroyArgs);
  throw std::runtime_error(message);
}

namespace {

// The api table is append-only: a function is callable iff its slot
// lies within the plugin's reported struct_size AND is non-null.
// The slot is read via memcpy ONLY after the bounds check: a plugin
// built against an older header allocates a smaller table, and
// `api->member` would be the very out-of-bounds read this check
// exists to prevent.
template <typename Fn>
Fn requireFn(const PJRT_Api *api, Fn /*type tag*/, std::size_t offset,
             const char *name) {
  Fn fn = nullptr;
  if (offset + sizeof(void *) <= api->struct_size) {
    std::memcpy(&fn, reinterpret_cast<const char *>(api) + offset,
                sizeof(fn));
  }
  if (fn == nullptr) {
    throw std::runtime_error(
        std::string("PJRT plugin does not provide ") + name);
  }
  return fn;
}

#define JOSHUPSCALE_REQUIRE_FN(api, name)                   \
  requireFn((api),                                          \
            static_cast<std::decay_t<decltype((api)->name)>>(nullptr), \
            offsetof(PJRT_Api, name), #name)

}  // namespace

PjrtEngine::PjrtEngine(const std::string &pluginPath,
                       const std::string &modelPath, int deviceId,
                       const std::string &optionsPath) {
  // The destructor does not run for a partially constructed object, so
  // any throw below (bad device id, compile error, version mismatch)
  // must release what was already acquired -- otherwise a host app
  // retrying createRuntime leaks live PJRT clients (which can keep the
  // device session pinned).
  try {
    construct(pluginPath, modelPath, deviceId, optionsPath);
  } catch (...) {
    cleanup();
    throw;
  }
}

void PjrtEngine::construct(const std::string &pluginPath,
                           const std::string &modelPath, int deviceId,
                           const std::string &optionsPath) {
  m_spec = parseStepSpec(modelPath + "/step_spec.txt");
  if (m_spec.inputs[0].byteSize() !=
      m_spec.frameHeight * m_spec.frameWidth * 3) {
    throw std::runtime_error(
        "PJRT backend requires a u8-I/O serving package "
        "(frame input is not H*W*3 bytes)");
  }
  if (m_spec.outputs[0].byteSize() !=
      outputWidth() * outputHeight() * 3) {
    throw std::runtime_error(
        "PJRT backend requires a u8-I/O serving package "
        "(display output is not 4H*4W*3 bytes)");
  }
  m_stateInit = [&] {
    std::string raw = readFile(modelPath + "/state_init.bin");
    return std::vector<std::uint8_t>(raw.begin(), raw.end());
  }();
  std::size_t stateBytes = 0;
  for (std::size_t i = 1; i < m_spec.inputs.size(); ++i) {
    stateBytes += m_spec.inputs[i].byteSize();
  }
  if (m_stateInit.size() != stateBytes) {
    throw std::runtime_error("state_init.bin size mismatch");
  }

  std::string program = readFile(modelPath + "/step.mlir");
  std::string compileOptions = readFile(modelPath + "/compile_options.pb");

  m_dl = dlopen(pluginPath.c_str(), RTLD_NOW | RTLD_LOCAL);
  if (m_dl == nullptr) {
    throw std::runtime_error(std::string("dlopen failed: ") + dlerror());
  }
  using GetPjrtApiFn = const PJRT_Api *();
  auto *getApi =
      reinterpret_cast<GetPjrtApiFn *>(dlsym(m_dl, "GetPjrtApi"));
  if (getApi == nullptr) {
    throw std::runtime_error(pluginPath + " exports no GetPjrtApi");
  }
  m_api = getApi();
  if (m_api == nullptr) {
    throw std::runtime_error("GetPjrtApi returned null");
  }
  if (m_api->pjrt_api_version.major_version != PJRT_API_MAJOR) {
    throw std::runtime_error(
        "PJRT major version mismatch: plugin " +
        std::to_string(m_api->pjrt_api_version.major_version) +
        ", client " + std::to_string(PJRT_API_MAJOR));
  }
  // Everything this backend calls must be in the plugin's table.
  JOSHUPSCALE_REQUIRE_FN(m_api, PJRT_Error_Destroy);
  JOSHUPSCALE_REQUIRE_FN(m_api, PJRT_Error_Message);
  JOSHUPSCALE_REQUIRE_FN(m_api, PJRT_Plugin_Initialize);
  JOSHUPSCALE_REQUIRE_FN(m_api, PJRT_Client_Create);
  JOSHUPSCALE_REQUIRE_FN(m_api, PJRT_Client_Destroy);
  JOSHUPSCALE_REQUIRE_FN(m_api, PJRT_Client_AddressableDevices);
  JOSHUPSCALE_REQUIRE_FN(m_api, PJRT_Client_Compile);
  JOSHUPSCALE_REQUIRE_FN(m_api, PJRT_Client_BufferFromHostBuffer);
  JOSHUPSCALE_REQUIRE_FN(m_api, PJRT_LoadedExecutable_Destroy);
  JOSHUPSCALE_REQUIRE_FN(m_api, PJRT_LoadedExecutable_Execute);
  JOSHUPSCALE_REQUIRE_FN(m_api, PJRT_Buffer_Destroy);
  JOSHUPSCALE_REQUIRE_FN(m_api, PJRT_Buffer_ToHostBuffer);
  JOSHUPSCALE_REQUIRE_FN(m_api, PJRT_Event_Destroy);
  JOSHUPSCALE_REQUIRE_FN(m_api, PJRT_Event_Await);

  {
    PJRT_Plugin_Initialize_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
    check(m_api->PJRT_Plugin_Initialize(&args), "PJRT_Plugin_Initialize");
  }

  ClientOptions options(optionsPath);
  {
    PJRT_Client_Create_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
    args.create_options = options.values.data();
    args.num_options = options.values.size();
    check(m_api->PJRT_Client_Create(&args), "PJRT_Client_Create");
    m_client = args.client;
  }
  {
    PJRT_Client_AddressableDevices_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
    args.client = m_client;
    check(m_api->PJRT_Client_AddressableDevices(&args),
          "PJRT_Client_AddressableDevices");
    if (deviceId < 0 ||
        static_cast<std::size_t>(deviceId) >= args.num_addressable_devices) {
      throw std::runtime_error(
          "Invalid device " + std::to_string(deviceId) + "; " +
          std::to_string(args.num_addressable_devices) + " available");
    }
    m_device = args.addressable_devices[deviceId];
  }
  {
    PJRT_Program prog;
    std::memset(&prog, 0, sizeof(prog));
    prog.struct_size = PJRT_Program_STRUCT_SIZE;
    prog.code = program.data();
    prog.code_size = program.size();
    static constexpr char kFormat[] = "mlir";
    prog.format = kFormat;
    prog.format_size = sizeof(kFormat) - 1;

    PJRT_Client_Compile_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
    args.client = m_client;
    args.program = &prog;
    args.compile_options = compileOptions.data();
    args.compile_options_size = compileOptions.size();
    check(m_api->PJRT_Client_Compile(&args), "PJRT_Client_Compile");
    m_exe = args.executable;
  }
  initState();
  JOSHUPSCALE_LOG_INFO << "PJRT engine loaded: " << modelPath << " via "
                       << pluginPath << " (" << inputWidth() << 'x'
                       << inputHeight() << " -> " << outputWidth() << 'x'
                       << outputHeight() << ')';
}

PjrtEngine::~PjrtEngine() { cleanup(); }

// Also runs from the constructor's failure path (the destructor never
// runs for a partially constructed object): every member it touches is
// null until the corresponding acquisition succeeds, so it is safe at
// any point of construction.
void PjrtEngine::cleanup() noexcept {
  dropPending();
  destroyState();
  if (m_exe != nullptr) {
    PJRT_LoadedExecutable_Destroy_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_LoadedExecutable_Destroy_Args_STRUCT_SIZE;
    args.executable = m_exe;
    PJRT_Error *err = m_api->PJRT_LoadedExecutable_Destroy(&args);
    if (err != nullptr) {
      PJRT_Error_Destroy_Args d;
      std::memset(&d, 0, sizeof(d));
      d.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
      d.error = err;
      m_api->PJRT_Error_Destroy(&d);
    }
  }
  if (m_client != nullptr) {
    PJRT_Client_Destroy_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_Destroy_Args_STRUCT_SIZE;
    args.client = m_client;
    PJRT_Error *err = m_api->PJRT_Client_Destroy(&args);
    if (err != nullptr) {
      PJRT_Error_Destroy_Args d;
      std::memset(&d, 0, sizeof(d));
      d.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
      d.error = err;
      m_api->PJRT_Error_Destroy(&d);
    }
  }
  if (m_dl != nullptr) {
    dlclose(m_dl);
  }
}

void PjrtEngine::destroyBuffer(PJRT_Buffer *buffer) const noexcept {
  if (buffer == nullptr) {
    return;
  }
  PJRT_Buffer_Destroy_Args args;
  std::memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
  args.buffer = buffer;
  PJRT_Error *err = m_api->PJRT_Buffer_Destroy(&args);
  if (err != nullptr) {
    PJRT_Error_Destroy_Args d;
    std::memset(&d, 0, sizeof(d));
    d.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
    d.error = err;
    m_api->PJRT_Error_Destroy(&d);
  }
}

PJRT_Buffer *PjrtEngine::bufferFromHost(const void *data,
                                        const TensorSpec &t) {
  PJRT_Client_BufferFromHostBuffer_Args args;
  std::memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
  args.client = m_client;
  args.data = data;
  args.type = toPjrtType(t.dtype);
  args.dims = t.dims.data();
  args.num_dims = t.dims.size();
  // Dense major-to-minor layout (numpy .tobytes() order).
  args.byte_strides = nullptr;
  args.num_byte_strides = 0;
  // The plugin copies `data` before the call returns, so the caller's
  // buffer can be reused immediately; the done event fires fast.
  args.host_buffer_semantics =
      PJRT_HostBufferSemantics_kImmutableOnlyDuringCall;
  args.device = m_device;
  check(m_api->PJRT_Client_BufferFromHostBuffer(&args),
        "PJRT_Client_BufferFromHostBuffer");
  if (args.done_with_host_buffer != nullptr) {
    PJRT_Event_Await_Args await;
    std::memset(&await, 0, sizeof(await));
    await.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
    await.event = args.done_with_host_buffer;
    PJRT_Error *err = m_api->PJRT_Event_Await(&await);
    PJRT_Event_Destroy_Args d;
    std::memset(&d, 0, sizeof(d));
    d.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
    d.event = args.done_with_host_buffer;
    m_api->PJRT_Event_Destroy(&d);
    if (err != nullptr) {
      destroyBuffer(args.buffer);
      check(err, "host-to-device transfer");
    }
  }
  return args.buffer;
}

void PjrtEngine::initState() {
  const std::uint8_t *cursor = m_stateInit.data();
  for (std::size_t i = 1; i < m_spec.inputs.size(); ++i) {
    m_state.push_back(bufferFromHost(cursor, m_spec.inputs[i]));
    cursor += m_spec.inputs[i].byteSize();
  }
}

void PjrtEngine::destroyState() noexcept {
  for (PJRT_Buffer *buffer : m_state) {
    destroyBuffer(buffer);
  }
  m_state.clear();
}

void PjrtEngine::reset() {
  dropPending();
  destroyState();
  initState();
}

// Upload one frame, enqueue the execute (PJRT execution is
// asynchronous: the call returns once the work is queued), rotate the
// donated state buffers, and START the display output's D2H copy
// without blocking on it -- the copy completes behind the returned
// event while the NEXT frame's execute runs.
void PjrtEngine::submit(const std::uint8_t *in, std::size_t inSize,
                        Pending *pending) {
  if (m_state.empty()) {
    // A prior failed execute destroyed the donated state handles
    // (see destroyState() below); re-running with num_args == 1
    // against the N-argument executable would surface as an opaque
    // plugin-side error.  Warm state from a wedged step is worthless
    // anyway, so recover with a fresh zero state automatically.
    JOSHUPSCALE_LOG_WARN
        << "re-initializing engine state after a failed execute";
    initState();
  }
  if (inSize != m_spec.inputs[0].byteSize()) {
    throw std::runtime_error(
        "Expected " + std::to_string(m_spec.inputs[0].byteSize()) +
        " input bytes, got " + std::to_string(inSize));
  }
  PJRT_Buffer *frame = bufferFromHost(in, m_spec.inputs[0]);

  std::vector<PJRT_Buffer *> argList;
  argList.reserve(1 + m_state.size());
  argList.push_back(frame);
  for (PJRT_Buffer *buffer : m_state) {
    argList.push_back(buffer);
  }
  PJRT_Buffer *const *argLists[] = {argList.data()};
  std::vector<PJRT_Buffer *> outputs(m_spec.outputs.size(), nullptr);
  PJRT_Buffer **outputLists[] = {outputs.data()};

  PJRT_ExecuteOptions execOptions;
  std::memset(&execOptions, 0, sizeof(execOptions));
  execOptions.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;

  PJRT_LoadedExecutable_Execute_Args args;
  std::memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
  args.executable = m_exe;
  args.options = &execOptions;
  args.argument_lists = argLists;
  args.num_devices = 1;
  args.num_args = argList.size();
  args.output_lists = outputLists;
  PJRT_Error *execErr = m_api->PJRT_LoadedExecutable_Execute(&args);
  // The state inputs were donated to the executable either way; their
  // handles must be destroyed and the engine reset before reuse.
  destroyState();
  destroyBuffer(frame);
  if (execErr != nullptr) {
    check(execErr, "PJRT_LoadedExecutable_Execute");
  }

  // Outputs: [0] display frame, [1:] new state.
  for (std::size_t i = 1; i < outputs.size(); ++i) {
    m_state.push_back(outputs[i]);
  }
  pending->host.resize(m_spec.outputs[0].byteSize());
  {
    // Request a dense row-major host copy EXPLICITLY.  With
    // host_layout null the plugin copies in the device buffer's own
    // layout -- and real TPU plugins pick a non-row-major layout for
    // the u8 display output (measured on the axon plugin: fully
    // reversed minor-to-major, i.e. the bytes land as (C, W, H)),
    // which scrambles the frame.  The TILED form with descending
    // minor_to_major and no tiles is dense row-major; plugins only
    // need to support this form (it is the one jaxlib's ToLiteral
    // path always passes -- the axon plugin REJECTS the Strides
    // form, measured).
    const TensorSpec &spec0 = m_spec.outputs[0];
    std::vector<std::int64_t> minorToMajor(spec0.dims.size());
    for (std::size_t i = 0; i < minorToMajor.size(); ++i) {
      minorToMajor[i] =
          static_cast<std::int64_t>(minorToMajor.size() - 1 - i);
    }
    PJRT_Buffer_MemoryLayout hostLayout;
    std::memset(&hostLayout, 0, sizeof(hostLayout));
    hostLayout.struct_size = PJRT_Buffer_MemoryLayout_STRUCT_SIZE;
    hostLayout.type = PJRT_Buffer_MemoryLayout_Type_Tiled;
    hostLayout.tiled.struct_size =
        PJRT_Buffer_MemoryLayout_Tiled_STRUCT_SIZE;
    hostLayout.tiled.minor_to_major = minorToMajor.data();
    hostLayout.tiled.minor_to_major_size = minorToMajor.size();

    PJRT_Buffer_ToHostBuffer_Args toHost;
    std::memset(&toHost, 0, sizeof(toHost));
    toHost.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
    toHost.src = outputs[0];
    toHost.host_layout = &hostLayout;
    toHost.dst = pending->host.data();
    toHost.dst_size = pending->host.size();
    PJRT_Error *err = m_api->PJRT_Buffer_ToHostBuffer(&toHost);
    if (err != nullptr) {
      destroyBuffer(outputs[0]);
      check(err, "device-to-host transfer");
    }
    pending->buffer = outputs[0];
    pending->event = toHost.event;
    pending->active = true;
  }
}

bool PjrtEngine::awaitPending(Pending *pending,
                              std::vector<std::uint8_t> *out) {
  if (!pending->active) {
    return false;
  }
  PJRT_Error *err = nullptr;
  if (pending->event != nullptr) {
    auto *event = static_cast<PJRT_Event *>(pending->event);
    PJRT_Event_Await_Args await;
    std::memset(&await, 0, sizeof(await));
    await.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
    await.event = event;
    err = m_api->PJRT_Event_Await(&await);
    PJRT_Event_Destroy_Args d;
    std::memset(&d, 0, sizeof(d));
    d.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
    d.event = event;
    m_api->PJRT_Event_Destroy(&d);
    pending->event = nullptr;
  }
  destroyBuffer(pending->buffer);
  pending->buffer = nullptr;
  pending->active = false;
  check(err, "device-to-host transfer");
  out->swap(pending->host);
  return true;
}

void PjrtEngine::dropPending() noexcept {
  if (!m_pending.active) {
    return;
  }
  // Await (ignoring errors) so the D2H is not writing into freed host
  // memory, then discard the frame.
  std::vector<std::uint8_t> discard;
  try {
    awaitPending(&m_pending, &discard);
  } catch (...) {
  }
}

void PjrtEngine::process(const std::uint8_t *in, std::size_t inSize,
                         std::vector<std::uint8_t> *out) {
  if (m_pending.active) {
    throw std::runtime_error(
        "process() called with an async frame in flight; flush first");
  }
  Pending pending;
  submit(in, inSize, &pending);
  awaitPending(&pending, out);
}

bool PjrtEngine::processAsync(const std::uint8_t *in, std::size_t inSize,
                              std::vector<std::uint8_t> *out) {
  // Submit frame t BEFORE blocking on frame t-1's D2H: the enqueue
  // order (execute t, then await d2h of t-1) is what lets the copy
  // ride out frame t's device compute.
  //
  // MOVE, never copy: frame t-1's D2H is still writing into
  // m_pending.host's heap buffer.  A copy would snapshot the
  // incomplete bytes AND free the DMA destination when m_pending is
  // reassigned (measured on the real axon plugin: max u8 diff 255 vs
  // the sync path).  The vector move keeps data() stable, so the
  // in-flight copy lands in the buffer `previous` now owns.
  Pending previous = std::move(m_pending);
  m_pending = Pending{};
  try {
    submit(in, inSize, &m_pending);
  } catch (...) {
    // Restore the old frame so flush() still drains it (move again --
    // its D2H may still be in flight).
    dropPending();
    m_pending = std::move(previous);
    throw;
  }
  return awaitPending(&previous, out);
}

bool PjrtEngine::flush(std::vector<std::uint8_t> *out) {
  return awaitPending(&m_pending, out);
}

}  // namespace core
}  // namespace JoshUpscale
