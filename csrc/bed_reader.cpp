// gmat-tpu native PLINK .bed decoder.
//
// Parity target: the reference decodes 2-bit PLINK codes {0b00,0b01,0b10,0b11}
// to {0, missing, 1, 2} (see /root/reference/gmat/process_plink/_read_plink_bed.c:37,
// which uses the (code^2+code)/6 mapping with a 1/3 missing sentinel).  We emit
// NaN for missing directly and write the id-major (num_id x num_snp) layout in
// one pass instead of decoding snp-major and transposing in Python
// (reference read_plink_bed.py:27-28).
//
// Build: see csrc/Makefile.  Loaded from Python via ctypes (gmat_tpu/io/bed.py).
#include <cstdint>
#include <cstdio>
#include <cmath>

namespace {

// Decode the 3-byte header; returns 0 on success.
int check_magic(FILE* f) {
  unsigned char magic[3];
  if (fread(magic, 1, 3, f) != 3) return -2;
  if (magic[0] != 0x6c || magic[1] != 0x1b) return -3;
  if (magic[2] != 0x01) return -4;  // only SNP-major layout supported
  return 0;
}

template <typename T>
int read_bed_impl(const char* path, int64_t num_id, int64_t num_snp, T* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  int rc = check_magic(f);
  if (rc != 0) {
    fclose(f);
    return rc;
  }
  const int64_t bytes_per_snp = (num_id + 3) / 4;
  const int64_t total = bytes_per_snp * num_snp;
  unsigned char* buf = new unsigned char[total];
  if ((int64_t)fread(buf, 1, total, f) != total) {
    delete[] buf;
    fclose(f);
    return -5;
  }
  fclose(f);
  const T lut[4] = {(T)0.0, (T)NAN, (T)1.0, (T)2.0};
#pragma omp parallel for schedule(static)
  for (int64_t s = 0; s < num_snp; ++s) {
    const unsigned char* col = buf + s * bytes_per_snp;
    for (int64_t i = 0; i < num_id; ++i) {
      const unsigned code = (unsigned)(col[i >> 2] >> ((i & 3) * 2)) & 3u;
      out[i * num_snp + s] = lut[code];
    }
  }
  delete[] buf;
  return 0;
}

}  // namespace

extern "C" {

int gmat_read_bed_f64(const char* path, int64_t num_id, int64_t num_snp,
                      double* out) {
  return read_bed_impl<double>(path, num_id, num_snp, out);
}

int gmat_read_bed_f32(const char* path, int64_t num_id, int64_t num_snp,
                      float* out) {
  return read_bed_impl<float>(path, num_id, num_snp, out);
}

// Stream the raw packed 2-bit codes (num_snp x bytes_per_snp, snp-major) so
// callers can ship 16x-compressed genotypes to the device and unpack there
// (gmat_tpu/io/bed.py:unpack_codes_device).
int gmat_read_bed_raw(const char* path, int64_t num_id, int64_t num_snp,
                      unsigned char* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  int rc = check_magic(f);
  if (rc != 0) {
    fclose(f);
    return rc;
  }
  const int64_t total = ((num_id + 3) / 4) * num_snp;
  const int64_t got = (int64_t)fread(out, 1, total, f);
  fclose(f);
  return got == total ? 0 : -5;
}

}  // extern "C"
