// PJRT backend lifecycle torture: constructor failure must release
// everything it acquired (a partially constructed engine's destructor
// never runs), a retry after failure must succeed, and a second
// client in the same process must get its own device list (a host app
// like the OBS filter retries createRuntime on failed loads and
// re-creates the runtime on settings changes).
//
// Runs against the mock PJRT plugin (JOSHUPSCALE_PJRT_PLUGIN +
// MOCK_PJRT_SPEC env, set by the test harness).
//
// Usage: test_pjrt_retry <model_package>

#include <cstdio>
#include <cstring>
#include <memory>
#include <string>
#include <vector>

#include "joshupscale/core.h"

namespace {

int processOneFrame(JoshUpscale::core::Runtime *runtime) {
  std::size_t inW = runtime->getInputWidth();
  std::size_t inH = runtime->getInputHeight();
  std::size_t outW = runtime->getOutputWidth();
  std::size_t outH = runtime->getOutputHeight();
  std::vector<std::uint8_t> inBuf(inW * inH * 3, 42);
  std::vector<std::uint8_t> outBuf(outW * outH * 3, 0);
  JoshUpscale::core::Image inImg{
      inBuf.data(), JoshUpscale::core::DataLocation::CPU,
      static_cast<std::ptrdiff_t>(inW * 3), inW, inH};
  JoshUpscale::core::Image outImg{
      outBuf.data(), JoshUpscale::core::DataLocation::CPU,
      static_cast<std::ptrdiff_t>(outW * 3), outW, outH};
  runtime->processImage(inImg, outImg);
  // The mock display rule XORs input bytes with 0x5A; any output
  // motion proves the frame went through the plugin.
  for (std::uint8_t b : outBuf) {
    if (b != 0) {
      return 0;
    }
  }
  std::fprintf(stderr, "output is all zeros\n");
  return 1;
}

}  // namespace

int main(int argc, char **argv) {
  if (argc != 2) {
    std::fprintf(stderr, "usage: %s <model_package>\n", argv[0]);
    return 2;
  }
  const char *pkg = argv[1];

  // 1. Out-of-range device: must throw (the mock exposes 1 device),
  //    and must not leak or poison later attempts.
  try {
    std::unique_ptr<JoshUpscale::core::Runtime> bad(
        JoshUpscale::core::createRuntime(7, pkg));
    std::fprintf(stderr, "device 7 unexpectedly succeeded\n");
    return 1;
  } catch (...) {
    std::string msg = JoshUpscale::core::getExceptionString();
    if (msg.find("device") == std::string::npos) {
      std::fprintf(stderr, "unexpected error: %s\n", msg.c_str());
      return 1;
    }
    std::fprintf(stderr, "expected failure: %s\n", msg.c_str());
  }

  try {
    // 2. Retry with a valid device: must succeed after the failure.
    std::unique_ptr<JoshUpscale::core::Runtime> first(
        JoshUpscale::core::createRuntime(0, pkg));
    if (processOneFrame(first.get()) != 0) {
      return 1;
    }
    // 3. Tear down and create a SECOND client in the same process
    //    (catches stale/static per-process device caching).
    first.reset();
    std::unique_ptr<JoshUpscale::core::Runtime> second(
        JoshUpscale::core::createRuntime(0, pkg));
    if (processOneFrame(second.get()) != 0) {
      return 1;
    }
  } catch (...) {
    std::fprintf(stderr, "error: %s\n",
                 JoshUpscale::core::getExceptionString().c_str());
    return 1;
  }
  std::printf("pjrt retry/multi-client OK\n");
  return 0;
}
