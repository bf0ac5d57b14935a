// Offline frame-stream upscaler — the native serving path end-to-end.
//
// Reads raw BGR24 frames from a file (or /dev/stdin), runs them through
// the recurrent runtime in order, writes raw upscaled frames out.  The
// functional analog of the reference's AviSynth filter main loop plus
// the Python TRT runner (scripts/inference/tensorrt/inference.py):
// sequential recurrence with on-device state, per-frame latency report.
//
// Usage: upscale_cli [--pipeline] <model_package> <in.raw> <out.raw>
//                    [num_frames]
//        (frame size is taken from the model; device 0)
// --pipeline serves through the 1-deep in-flight queue
// (processImageAsync): frame t+1's upload/execute overlaps frame t's
// output transfer -- same outputs, one frame of latency inside the
// loop, drained at EOF.

#include <chrono>
#include <cstdio>
#include <cstring>
#include <memory>
#include <vector>

#include "joshupscale/core.h"

int main(int argc, char **argv) {
  bool pipeline = false;
  if (argc > 1 && std::strcmp(argv[1], "--pipeline") == 0) {
    pipeline = true;
    --argc;
    ++argv;
  }
  if (argc < 4) {
    std::fprintf(
        stderr,
        "usage: %s [--pipeline] <model_package> <in.raw> <out.raw> "
        "[num_frames]\n",
        argv[0]);
    return 2;
  }
  try {
    std::unique_ptr<JoshUpscale::core::Runtime> runtime(
        JoshUpscale::core::createRuntime(0, argv[1]));
    std::size_t inW = runtime->getInputWidth();
    std::size_t inH = runtime->getInputHeight();
    std::size_t outW = runtime->getOutputWidth();
    std::size_t outH = runtime->getOutputHeight();
    std::size_t inSize = inW * inH * 3;
    std::size_t outSize = outW * outH * 3;

    std::FILE *fin = std::fopen(argv[2], "rb");
    if (fin == nullptr) {
      std::fprintf(stderr, "cannot open %s\n", argv[2]);
      return 1;
    }
    std::FILE *fout = std::fopen(argv[3], "wb");
    if (fout == nullptr) {
      std::fprintf(stderr, "cannot open %s\n", argv[3]);
      std::fclose(fin);
      return 1;
    }
    long maxFrames = argc > 4 ? std::atol(argv[4]) : -1;

    std::vector<std::uint8_t> inBuf(inSize);
    std::vector<std::uint8_t> outBuf(outSize);
    JoshUpscale::core::Image inImg{
        inBuf.data(), JoshUpscale::core::DataLocation::CPU,
        static_cast<std::ptrdiff_t>(inW * 3), inW, inH};
    JoshUpscale::core::Image outImg{
        outBuf.data(), JoshUpscale::core::DataLocation::CPU,
        static_cast<std::ptrdiff_t>(outW * 3), outW, outH};

    long frames = 0;
    long submitted = 0;
    double totalSeconds = 0.0;
    while (maxFrames < 0 || submitted < maxFrames) {
      if (std::fread(inBuf.data(), 1, inSize, fin) != inSize) {
        break;
      }
      auto start = std::chrono::steady_clock::now();
      bool ready = pipeline ? runtime->processImageAsync(inImg, outImg)
                            : (runtime->processImage(inImg, outImg), true);
      totalSeconds += std::chrono::duration<double>(
                          std::chrono::steady_clock::now() - start)
                          .count();
      ++submitted;
      if (ready) {
        if (std::fwrite(outBuf.data(), 1, outSize, fout) != outSize) {
          std::fprintf(stderr, "short write to %s\n", argv[3]);
          return 1;
        }
        ++frames;
      }
    }
    if (pipeline) {
      auto start = std::chrono::steady_clock::now();
      while (runtime->flushImage(outImg)) {
        totalSeconds += std::chrono::duration<double>(
                            std::chrono::steady_clock::now() - start)
                            .count();
        if (std::fwrite(outBuf.data(), 1, outSize, fout) != outSize) {
          std::fprintf(stderr, "short write to %s\n", argv[3]);
          return 1;
        }
        ++frames;
        start = std::chrono::steady_clock::now();
      }
    }
    std::fclose(fin);
    if (std::fclose(fout) != 0) {
      // Buffered writes flush at close: a full disk must not exit 0.
      std::fprintf(stderr, "error closing %s\n", argv[3]);
      return 1;
    }
    std::fprintf(stderr, "processed %ld frames, avg %.3f ms/frame%s\n",
                 frames, frames > 0 ? totalSeconds / frames * 1e3 : 0.0,
                 pipeline ? " (pipelined)" : "");
    return 0;
  } catch (...) {
    std::fprintf(stderr, "error: %s\n",
                 JoshUpscale::core::getExceptionString().c_str());
    return 1;
  }
}
