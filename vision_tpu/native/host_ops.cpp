// Native host-side ops for vision_tpu.
//
// TPU-native re-provision of the reference's C++ host runtime pieces that
// remain on the CPU in this framework: pixel conversion (reference
// src/visp/image.cpp:213-288), separable box blur (:358-419), erosion
// (:509-535), overlap-blend tile merge (:655-693), and the YOLO NMS loop
// (src/visp/arch/yolov9t.cpp:1117-1253). Exported as a C ABI (the analog of
// the reference's c-api.cpp error-code surface) and consumed from Python
// via ctypes (bindings live in vision_tpu/native/__init__.py); every entry
// point has a vectorized numpy fallback so the extension is optional.
//
// Build: `make -C vision_tpu/native` (g++ -O3 -shared).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// dst[y][x][c] = (src[min(y+oy, sh-1)][min(x+ox, sw-1)][map[c]]/255 + offset[c]) * scale[c]
void visp_u8_to_f32(
    const uint8_t* src, int sh, int sw, int sc,
    float* dst, int dh, int dw, int dc,
    const float* offset, const float* scale,
    int ox, int oy, const int* chmap) {
    for (int y = 0; y < dh; ++y) {
        int sy = std::min(y + oy, sh - 1);
        const uint8_t* srow = src + (size_t)sy * sw * sc;
        float* drow = dst + (size_t)y * dw * dc;
        for (int x = 0; x < dw; ++x) {
            int sx = std::min(x + ox, sw - 1);
            const uint8_t* p = srow + (size_t)sx * sc;
            for (int c = 0; c < dc; ++c) {
                // default map: 1-channel sources splat to every lane
                // (image-impl.h alpha/gray load; numpy load_f32x4 c==1);
                // otherwise identity
                int sc_idx = chmap ? chmap[c] : (sc == 1 ? 0 : c);
                // missing source lane reads as 1/255, matching the
                // reference u8 load {r,g,b,1}/255 (image-impl.h:22-26) and
                // the numpy load_f32x4 path; negative map entries are
                // treated as missing, never an out-of-bounds read
                float v = (sc_idx >= 0 && sc_idx < sc)
                    ? float(p[sc_idx]) / 255.0f : 1.0f / 255.0f;
                drow[(size_t)x * dc + c] = (v + offset[c]) * scale[c];
            }
        }
    }
}

// dst = uint8(clamp(src*scale + offset, 0, 1) * 255)  (truncating)
void visp_f32_to_u8(
    const float* src, uint8_t* dst, int64_t n, float scale, float offset) {
    for (int64_t i = 0; i < n; ++i) {
        float v = src[i] * scale + offset;
        v = std::min(std::max(v, 0.0f), 1.0f) * 255.0f;
        dst[i] = (uint8_t)v;
    }
}

// separable sliding-window box blur over edge-replicated signal
void visp_box_blur(const float* src, float* dst, int h, int w, int c, int radius) {
    std::vector<double> tmp((size_t)h * w * c);
    double weight = 1.0 / (2 * radius + 1);
    // horizontal
    for (int y = 0; y < h; ++y) {
        for (int ch = 0; ch < c; ++ch) {
            const float* row = src + ((size_t)y * w) * c + ch;
            double* trow = tmp.data() + ((size_t)y * w) * c + ch;
            double sum = radius * row[0];
            for (int x = 0; x <= radius; ++x) sum += row[(size_t)std::min(x, w - 1) * c];
            trow[0] = sum * weight;
            for (int x = 1; x < w; ++x) {
                int left = std::max(std::min(x - radius - 1, w - 1), 0);
                int right = std::min(x + radius, w - 1);
                sum += row[(size_t)right * c] - row[(size_t)left * c];
                trow[(size_t)x * c] = sum * weight;
            }
        }
    }
    // vertical
    for (int ch = 0; ch < c; ++ch) {
        for (int x = 0; x < w; ++x) {
            const double* col = tmp.data() + (size_t)x * c + ch;
            float* dcol = dst + (size_t)x * c + ch;
            size_t stride = (size_t)w * c;
            double sum = radius * col[0];
            for (int y = 0; y <= radius; ++y) sum += col[(size_t)std::min(y, h - 1) * stride];
            dcol[0] = float(sum * weight);
            for (int y = 1; y < h; ++y) {
                int top = std::max(std::min(y - radius - 1, h - 1), 0);
                int bottom = std::min(y + radius, h - 1);
                sum += col[(size_t)bottom * stride] - col[(size_t)top * stride];
                dcol[(size_t)y * stride] = float(sum * weight);
            }
        }
    }
}

// min-filter with replicate border (single channel)
void visp_erosion_f32(const float* src, float* dst, int h, int w, int radius) {
    std::vector<float> tmp((size_t)h * w);
    for (int y = 0; y < h; ++y) {  // horizontal pass
        for (int x = 0; x < w; ++x) {
            float v = src[(size_t)y * w + std::max(0, std::min(x - radius, w - 1))];
            for (int dx = -radius; dx <= radius; ++dx) {
                int nx = std::max(0, std::min(x + dx, w - 1));
                v = std::min(v, src[(size_t)y * w + nx]);
            }
            tmp[(size_t)y * w + x] = v;
        }
    }
    for (int y = 0; y < h; ++y) {  // vertical pass
        for (int x = 0; x < w; ++x) {
            float v = tmp[(size_t)std::max(0, std::min(y - radius, h - 1)) * w + x];
            for (int dy = -radius; dy <= radius; ++dy) {
                int ny = std::max(0, std::min(y + dy, h - 1));
                v = std::min(v, tmp[(size_t)ny * w + x]);
            }
            dst[(size_t)y * w + x] = v;
        }
    }
}

// accumulate a tile into dst with the reference's overlap blend weights.
// blend: (th, tw) precomputed normalized weights; region starts at (bx, by).
void visp_tile_merge(
    const float* tile, int th, int tw,
    const float* blend,
    float* dst, int dh, int dw,
    int bx, int by, int c) {
    for (int y = 0; y < th; ++y) {
        if (by + y >= dh) break;
        const float* trow = tile + (size_t)y * tw * c;
        const float* brow = blend + (size_t)y * tw;
        float* drow = dst + ((size_t)(by + y) * dw + bx) * c;
        for (int x = 0; x < tw && bx + x < dw; ++x) {
            float b = brow[x];
            for (int ch = 0; ch < c; ++ch) {
                drow[(size_t)x * c + ch] += b * trow[(size_t)x * c + ch];
            }
        }
    }
}

// greedy NMS with per-class offsets. boxes: (n,4) xyxy; returns kept count.
int visp_nms(
    const float* boxes, const float* scores, const int* class_ids, int n,
    float iou_thres, int max_wh, int max_det, int* keep_out) {
    std::vector<int> order(n);
    std::iota(order.begin(), order.end(), 0);
    std::stable_sort(order.begin(), order.end(), [&](int a, int b) {
        return scores[a] > scores[b];
    });
    std::vector<char> alive(n, 1);
    int kept = 0;
    for (int ii = 0; ii < n && kept < max_det; ++ii) {
        int i = order[ii];
        if (!alive[i]) continue;
        keep_out[kept++] = i;
        float ci = float(class_ids[i]) * max_wh;
        float ix1 = boxes[i * 4 + 0] + ci, iy1 = boxes[i * 4 + 1];
        float ix2 = boxes[i * 4 + 2] + ci, iy2 = boxes[i * 4 + 3];
        float areai = (ix2 - ix1) * (iy2 - iy1);
        for (int jj = ii + 1; jj < n; ++jj) {
            int j = order[jj];
            if (!alive[j]) continue;
            float cj = float(class_ids[j]) * max_wh;
            float jx1 = boxes[j * 4 + 0] + cj, jy1 = boxes[j * 4 + 1];
            float jx2 = boxes[j * 4 + 2] + cj, jy2 = boxes[j * 4 + 3];
            float xx1 = std::max(ix1, jx1), yy1 = std::max(iy1, jy1);
            float xx2 = std::min(ix2, jx2), yy2 = std::min(iy2, jy2);
            float inter = std::max(0.0f, xx2 - xx1) * std::max(0.0f, yy2 - yy1);
            float areaj = (jx2 - jx1) * (jy2 - jy1);
            float iou = inter / (areai + areaj - inter + 1e-9f);
            if (iou > iou_thres) alive[j] = 0;
        }
    }
    return kept;
}

// thread-local last-error (reference c-api.cpp:6-21 discipline)
static thread_local char g_last_error[256] = {0};

const char* visp_get_last_error() { return g_last_error; }

void visp_set_last_error(const char* msg) {
    std::strncpy(g_last_error, msg, sizeof(g_last_error) - 1);
    g_last_error[sizeof(g_last_error) - 1] = 0;
}

int visp_version() { return 100; }

}  // extern "C"
