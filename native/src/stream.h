// Sequential video stream with seek handling — the C++ analog of the
// reference AviSynth filter's frame-order logic
// (avisynth_plugin/src/main.cc:75-157): monotone serving, bounded
// backtrack via re-reading earlier frames, stream reset + warm-up on
// larger jumps, LRU cache of recent outputs.

#ifndef JOSHUPSCALE_SRC_STREAM_H_
#define JOSHUPSCALE_SRC_STREAM_H_

#include <cstdint>
#include <functional>
#include <list>
#include <stdexcept>
#include <unordered_map>
#include <vector>

#include "joshupscale/core.h"

namespace JoshUpscale {
namespace core {

class VideoStream {
 public:
  static constexpr int kMaxBacktrack = 16;

  // `source(index, buffer)` must fill `buffer` with the contiguous BGR24
  // input frame `index` (always >= 0: warm-up lead-ins before frame 0
  // arrive mirrored, reference main.cc:110).
  using Source =
      std::function<void(int, std::vector<std::uint8_t> *)>;

  VideoStream(Runtime *runtime, Source source,
              int maxBacktrack = kMaxBacktrack)
      : m_runtime(runtime),
        m_source(std::move(source)),
        m_maxBacktrack(maxBacktrack),
        // The stream opens in a warm-up window (reference
        // m_NextFrame = -MAX_BACKTRACK_SIZE): frame 0 is served with
        // real mirrored-motion lead-in.
        m_nextFrame(-maxBacktrack),
        m_dontCache(maxBacktrack) {
    if (maxBacktrack < 1) {
      // 0 would evict every frame the moment it is cached and then
      // return the front() of an empty list -- UB.
      throw std::invalid_argument("maxBacktrack must be >= 1");
    }
  }

  // Upscaled frame n (contiguous BGR24), enforcing sequential
  // recurrence.
  const std::vector<std::uint8_t> &getFrame(int n);

 private:
  void reset(int startFrame);
  const std::vector<std::uint8_t> &processNext(int n);

  Runtime *m_runtime;
  Source m_source;
  int m_maxBacktrack;
  int m_nextFrame;
  int m_dontCache;
  std::list<std::pair<int, std::vector<std::uint8_t>>> m_cache;
  std::vector<std::uint8_t> m_inBuffer;
  std::vector<std::uint8_t> m_lastOutput;
};

}  // namespace core
}  // namespace JoshUpscale

#endif  // JOSHUPSCALE_SRC_STREAM_H_
