// Native NIfTI-1 loader — C++ fast path for the data pipeline.
//
// The reference's data plumbing rides MONAI/nibabel (SURVEY §1 L1); this
// framework reads NIfTI directly. The Python implementation
// (veloxseg_tpu/data/nifti.py) is the reference; this library accelerates
// the hot path (gzip inflate + dtype decode + scaling) and is loaded via
// ctypes (veloxseg_tpu/data/nifti_fast.py). Build: see native/build.sh.
//
// Exported C ABI:
//   int vs_nifti_read_header(path, VsNiftiHeader* out)
//   int vs_nifti_read_f32(path, float* out, int64 capacity)
//       -> decodes voxels (Fortran order preserved), applies
//          scl_slope/inter, returns 0 on success.
// Thread-safe; no global state. Errors return negative codes.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include <zlib.h>

namespace {

constexpr int kHeaderSize = 348;

struct RawHeader {
    int32_t sizeof_hdr;      // 0
    int16_t dim[8];          // 40
    int16_t datatype;        // 70
    float pixdim[8];         // 76
    float vox_offset;        // 108
    float scl_slope;         // 112
    float scl_inter;         // 116
};

bool read_file(const char* path, std::vector<uint8_t>& out) {
    size_t n = std::strlen(path);
    bool gz = n > 3 && std::strcmp(path + n - 3, ".gz") == 0;
    if (gz) {
        // Pre-size from the gzip ISIZE trailer (uncompressed size mod 2^32)
        // so inflate writes straight into the destination buffer.
        uint32_t isize = 0;
        if (FILE* rf = std::fopen(path, "rb")) {
            std::fseek(rf, -4, SEEK_END);
            uint8_t tr[4];
            if (std::fread(tr, 1, 4, rf) == 4) {
                isize = static_cast<uint32_t>(tr[0]) |
                        (static_cast<uint32_t>(tr[1]) << 8) |
                        (static_cast<uint32_t>(tr[2]) << 16) |
                        (static_cast<uint32_t>(tr[3]) << 24);
            }
            std::fclose(rf);
        }
        gzFile f = gzopen(path, "rb");
        if (!f) return false;
        gzbuffer(f, 1 << 20);
        out.resize(isize ? isize : (1 << 22));
        size_t filled = 0;
        int got;
        while ((got = gzread(f, out.data() + filled,
                             static_cast<unsigned>(out.size() - filled)))
               > 0) {
            filled += static_cast<size_t>(got);
            if (filled == out.size()) out.resize(out.size() * 2);
        }
        gzclose(f);
        out.resize(filled);
        return got == 0;
    }
    FILE* f = std::fopen(path, "rb");
    if (!f) return false;
    std::fseek(f, 0, SEEK_END);
    long sz = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    out.resize(static_cast<size_t>(sz));
    size_t rd = std::fread(out.data(), 1, out.size(), f);
    std::fclose(f);
    return rd == out.size();
}

template <typename T>
void decode(const uint8_t* src, int64_t count, float slope, float inter,
            float* dst) {
    const T* p = reinterpret_cast<const T*>(src);
    if (slope == 0.f || (slope == 1.f && inter == 0.f)) {
        for (int64_t i = 0; i < count; ++i) dst[i] = static_cast<float>(p[i]);
    } else {
        for (int64_t i = 0; i < count; ++i)
            dst[i] = static_cast<float>(p[i]) * slope + inter;
    }
}

bool parse_header(const std::vector<uint8_t>& raw, RawHeader* h) {
    if (raw.size() < kHeaderSize) return false;
    std::memcpy(&h->sizeof_hdr, raw.data() + 0, 4);
    if (h->sizeof_hdr != kHeaderSize) return false;  // big-endian: py path
    std::memcpy(h->dim, raw.data() + 40, 16);
    std::memcpy(&h->datatype, raw.data() + 70, 2);
    std::memcpy(h->pixdim, raw.data() + 76, 32);
    std::memcpy(&h->vox_offset, raw.data() + 108, 4);
    std::memcpy(&h->scl_slope, raw.data() + 112, 4);
    std::memcpy(&h->scl_inter, raw.data() + 116, 4);
    return true;
}

}  // namespace

extern "C" {

struct VsNiftiHeader {
    int32_t ndim;
    int32_t shape[7];
    float spacing[7];
    int32_t datatype;
    int64_t voxels;
};

int vs_nifti_read_header(const char* path, VsNiftiHeader* out) {
    std::vector<uint8_t> raw;
    if (!read_file(path, raw)) return -1;
    RawHeader h;
    if (!parse_header(raw, &h)) return -2;
    out->ndim = h.dim[0];
    int64_t voxels = 1;
    for (int i = 0; i < 7; ++i) {
        int32_t d = (i < h.dim[0]) ? h.dim[i + 1] : 1;
        out->shape[i] = d;
        out->spacing[i] = (i < h.dim[0]) ? h.pixdim[i + 1] : 1.f;
        voxels *= d;
    }
    out->datatype = h.datatype;
    out->voxels = voxels;
    return 0;
}

int vs_nifti_read_f32(const char* path, float* dst, int64_t capacity) {
    std::vector<uint8_t> raw;
    if (!read_file(path, raw)) return -1;
    RawHeader h;
    if (!parse_header(raw, &h)) return -2;
    int64_t voxels = 1;
    for (int i = 0; i < h.dim[0]; ++i) voxels *= h.dim[i + 1];
    if (voxels > capacity) return -3;
    const size_t off = static_cast<size_t>(h.vox_offset);
    if (raw.size() < off) return -4;
    const uint8_t* src = raw.data() + off;
    const float s = h.scl_slope, b = h.scl_inter;
    switch (h.datatype) {
        case 2:    decode<uint8_t>(src, voxels, s, b, dst); break;
        case 4:    decode<int16_t>(src, voxels, s, b, dst); break;
        case 8:    decode<int32_t>(src, voxels, s, b, dst); break;
        case 16:   decode<float>(src, voxels, s, b, dst); break;
        case 64:   decode<double>(src, voxels, s, b, dst); break;
        case 256:  decode<int8_t>(src, voxels, s, b, dst); break;
        case 512:  decode<uint16_t>(src, voxels, s, b, dst); break;
        case 768:  decode<uint32_t>(src, voxels, s, b, dst); break;
        default:   return -5;
    }
    return 0;
}

}  // extern "C"
