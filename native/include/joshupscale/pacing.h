// Frame pacing helper: the OBS filter's "Limit to 30 FPS" behaviour
// (reference obs_plugin/src/filter.cc:201-226): the filter keeps
// redrawing the last upscaled frame every render and only reprocesses
// through the model when the accumulated source time exceeds the frame
// budget -- or on every tick when the limit is off.  Header-only so
// plugin shims can embed it without linking extras.

#ifndef JOSHUPSCALE_PACING_H_
#define JOSHUPSCALE_PACING_H_

namespace JoshUpscale {
namespace core {

class FramePacer {
 public:
  // `frameBudgetSeconds` matches the reference's 0.03 s (~30 FPS cap).
  explicit FramePacer(bool limitFps = true,
                      float frameBudgetSeconds = 0.03F) noexcept
      : m_limitFps(limitFps), m_budget(frameBudgetSeconds) {}

  void setLimitFps(bool limitFps) noexcept { m_limitFps = limitFps; }
  bool limitFps() const noexcept { return m_limitFps; }

  // Per render tick (reference videoTick): accumulate elapsed source
  // seconds; when the budget is exceeded (or the limit is off) the next
  // render must reprocess.
  void tick(float seconds) noexcept {
    m_accumulated += seconds;
    if (m_accumulated > m_budget || !m_limitFps) {
      m_pending = true;
    }
  }

  // True when the next render should run the model; the caller then
  // calls markProcessed() on success (reference render():201-208).
  bool shouldProcess() const noexcept { return m_pending; }

  void markProcessed() noexcept {
    m_pending = false;
    m_accumulated = 0.0F;
  }

  // Force reprocessing on the next render (model switch / input-size
  // change, reference update():146-151, render():195-200).
  void invalidate() noexcept { m_pending = true; }

 private:
  bool m_limitFps;
  float m_budget;
  float m_accumulated = 0.0F;
  bool m_pending = true;  // first frame always processes
};

}  // namespace core
}  // namespace JoshUpscale

#endif  // JOSHUPSCALE_PACING_H_
