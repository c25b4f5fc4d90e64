// frame_pump: native video decode + preprocess pipeline.
//
// The reference's ingest is ffmpeg-to-JPEG-files plus per-frame PIL reads
// (video_to_frames.sh:23, SurgDataset.__getitem__) — two full disk round
// trips per frame.  This library decodes the container directly (OpenCV /
// libavcodec), center-crops and resizes on a background thread, and hands
// ready uint8 RGB batches to Python through a bounded ring buffer, so host
// decode overlaps TPU compute and PCIe carries 224x224 crops instead of
// full frames.
//
// C ABI (ctypes-friendly):
//   fp_open(path, out_size, crop_h_frac, crop_w_frac, queue_cap) -> handle
//   fp_meta(handle, &fps, &nframes, &height, &width)
//   fp_read(handle, out, max_frames) -> frames written (0 == EOF)
//   fp_close(handle)
//
// Crop arithmetic matches sais_tpu.ops.preprocess.center_crop_bounds
// (torchvision CenterCrop rounding + PIL box truncation).

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <thread>

#include <opencv2/core.hpp>
#include <opencv2/imgproc.hpp>
#include <opencv2/videoio.hpp>

namespace {

struct CropBounds {
  int lo, hi;
};

CropBounds crop_bounds(int size, double frac) {
  double crop = frac * size;
  // round-half-to-even, matching Python round() in
  // ops/preprocess.center_crop_bounds (std::lround rounds half AWAY from
  // zero and would shift the crop by one pixel at exact .5 midpoints)
  double x = (size - crop) / 2.0;
  double r = std::nearbyint(x);  // default FE_TONEAREST = half-to-even
  int top = static_cast<int>(r);
  return {top, static_cast<int>(top + crop)};
}

struct FramePump {
  cv::VideoCapture cap;
  int out_size;
  double crop_h, crop_w;
  size_t queue_cap;

  std::thread worker;
  std::mutex mu;
  std::condition_variable cv_push, cv_pop;
  std::deque<cv::Mat> queue;
  std::atomic<bool> done{false};
  std::atomic<bool> stop{false};

  double fps = 0;
  long nframes = 0;
  int height = 0, width = 0;

  void run() {
    cv::Mat bgr;
    while (!stop.load()) {
      if (!cap.read(bgr)) break;
      CropBounds rb = crop_bounds(bgr.rows, crop_h);
      CropBounds cb = crop_bounds(bgr.cols, crop_w);
      cv::Mat cropped = bgr(cv::Range(rb.lo, rb.hi), cv::Range(cb.lo, cb.hi));
      cv::Mat resized;
      // INTER_AREA: antialiased downscale (closest OpenCV match to the
      // reference's antialiased PIL bilinear)
      cv::resize(cropped, resized, cv::Size(out_size, out_size), 0, 0,
                 cv::INTER_AREA);
      cv::Mat rgb;
      cv::cvtColor(resized, rgb, cv::COLOR_BGR2RGB);
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_push.wait(lk, [&] { return queue.size() < queue_cap || stop; });
        if (stop) break;
        queue.push_back(rgb.clone());
      }
      cv_pop.notify_one();
    }
    done.store(true);
    cv_pop.notify_all();
  }
};

}  // namespace

extern "C" {

void* fp_open(const char* path, int out_size, double crop_h_frac,
              double crop_w_frac, int queue_cap) {
  auto* p = new FramePump();
  if (!p->cap.open(path)) {
    delete p;
    return nullptr;
  }
  p->out_size = out_size;
  p->crop_h = crop_h_frac;
  p->crop_w = crop_w_frac;
  p->queue_cap = queue_cap > 0 ? static_cast<size_t>(queue_cap) : 64;
  p->fps = p->cap.get(cv::CAP_PROP_FPS);
  p->nframes = static_cast<long>(p->cap.get(cv::CAP_PROP_FRAME_COUNT));
  p->height = static_cast<int>(p->cap.get(cv::CAP_PROP_FRAME_HEIGHT));
  p->width = static_cast<int>(p->cap.get(cv::CAP_PROP_FRAME_WIDTH));
  p->worker = std::thread([p] { p->run(); });
  return p;
}

int fp_meta(void* h, double* fps, long* nframes, int* height, int* width) {
  if (!h) return -1;
  auto* p = static_cast<FramePump*>(h);
  *fps = p->fps;
  *nframes = p->nframes;
  *height = p->height;
  *width = p->width;
  return 0;
}

long fp_read(void* h, unsigned char* out, long max_frames) {
  if (!h) return -1;
  auto* p = static_cast<FramePump*>(h);
  const size_t frame_bytes =
      static_cast<size_t>(p->out_size) * p->out_size * 3;
  long written = 0;
  while (written < max_frames) {
    cv::Mat frame;
    {
      std::unique_lock<std::mutex> lk(p->mu);
      p->cv_pop.wait(lk, [&] { return !p->queue.empty() || p->done.load(); });
      if (p->queue.empty()) break;  // EOF
      frame = p->queue.front();
      p->queue.pop_front();
    }
    p->cv_push.notify_one();
    std::memcpy(out + written * frame_bytes, frame.data, frame_bytes);
    ++written;
  }
  return written;
}

void fp_close(void* h) {
  if (!h) return;
  auto* p = static_cast<FramePump*>(h);
  p->stop.store(true);
  p->cv_push.notify_all();
  if (p->worker.joinable()) p->worker.join();
  delete p;
}

}  // extern "C"
