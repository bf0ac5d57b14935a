#include "stream.h"

#include <stdexcept>

namespace JoshUpscale {
namespace core {

const std::vector<std::uint8_t> &VideoStream::getFrame(int n) {
  if (n < m_nextFrame) {
    for (auto it = m_cache.begin(); it != m_cache.end(); ++it) {
      if (it->first == n) {
        m_cache.splice(m_cache.begin(), m_cache, it);  // LRU bump
        return m_cache.front().second;
      }
    }
    reset(n);  // large backward seek: replay warm-up
  } else if (n - m_nextFrame > m_maxBacktrack) {
    reset(n);  // large forward jump: re-warm from n - backtrack
  }
  while (m_nextFrame < n) {
    processNext(m_nextFrame);
  }
  return processNext(n);
}

void VideoStream::reset(int startFrame) {
  m_runtime->reset();
  m_cache.clear();
  m_nextFrame = startFrame - m_maxBacktrack;
  m_dontCache = m_maxBacktrack;
}

const std::vector<std::uint8_t> &VideoStream::processNext(int n) {
  // Mirrored warm-up lead-in (reference main.cc:110,
  // child->GetFrame(n >= 0 ? n : -n)): pre-stream frames carry real
  // motion instead of a frozen frame 0.
  m_source(n < 0 ? -n : n, &m_inBuffer);
  std::size_t inRow = m_runtime->getInputWidth() * 3;
  std::size_t outRow = m_runtime->getOutputWidth() * 3;
  if (m_inBuffer.size() != inRow * m_runtime->getInputHeight()) {
    throw std::runtime_error("Source frame size mismatch");
  }
  std::vector<std::uint8_t> outBuffer(
      outRow * m_runtime->getOutputHeight());

  Image in;
  in.ptr = m_inBuffer.data();
  in.stride = static_cast<std::ptrdiff_t>(inRow);
  in.width = m_runtime->getInputWidth();
  in.height = m_runtime->getInputHeight();
  Image out;
  out.ptr = outBuffer.data();
  out.stride = static_cast<std::ptrdiff_t>(outRow);
  out.width = m_runtime->getOutputWidth();
  out.height = m_runtime->getOutputHeight();
  m_runtime->processImage(in, out);
  m_nextFrame = n + 1;

  if (m_dontCache > 0) {
    // Warm-up output after ANY reset (not just pre-stream indices):
    // computed from partially-warmed state, never cached (reference
    // m_DontCache, main.cc:150-157) -- a later back-seek must re-warm
    // instead of serving the degraded frame.
    --m_dontCache;
    m_lastOutput = std::move(outBuffer);
    return m_lastOutput;
  }
  m_cache.emplace_front(n, std::move(outBuffer));
  while (m_cache.size() > static_cast<std::size_t>(m_maxBacktrack)) {
    m_cache.pop_back();
  }
  return m_cache.front().second;
}

}  // namespace core
}  // namespace JoshUpscale
