// C ABI boundary layer for celo_bls_snark_tpu.
//
// Native equivalent of crates/bls-snark-sys (which compiles Rust to a C
// staticlib for the Celo blockchain client): the same extern "C" surface —
// opaque key/signature handles, byte-buffer outputs with explicit
// destructors, bool returns — implemented in C++ over the embedded CPython
// runtime hosting the TPU framework. Function names, argument orders and
// buffer conventions mirror crates/bls-snark-sys/src/{signatures,
// serialization, snark/mod}.rs so a client linking against the reference's
// ABI can relink against this library unchanged.
//
// Build: see Makefile in this directory (produces libbls_snark_tpu.so).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <mutex>

namespace {

std::once_flag g_init_flag;
PyObject *g_api = nullptr;  // celo_bls_snark_tpu.ffi.api module
bool g_owns_interpreter = false;

void ensure_python() {
  std::call_once(g_init_flag, [] {
    if (!Py_IsInitialized()) {
      Py_InitializeEx(0);
      g_owns_interpreter = true;
    }
  });
}

// RAII GIL holder usable from foreign threads.
class Gil {
 public:
  Gil() : state_(PyGILState_Ensure()) {}
  ~Gil() { PyGILState_Release(state_); }

 private:
  PyGILState_STATE state_;
};

PyObject *api() {
  if (g_api == nullptr) {
    g_api = PyImport_ImportModule("celo_bls_snark_tpu.ffi.api");
    if (g_api == nullptr) {
      PyErr_Print();
    }
  }
  return g_api;
}

// convert_result_to_bool equivalent: clear the Python error and return false
bool fail() {
  if (PyErr_Occurred()) PyErr_Print();
  PyErr_Clear();
  return false;
}

// Copy `bytes` out into a malloc'd buffer handed to the caller
// (freed via free_vec, mirroring the leaked-Vec convention).
bool emit_bytes(PyObject *bytes, uint8_t **out, int32_t *out_len) {
  if (bytes == nullptr || !PyBytes_Check(bytes)) return false;
  Py_ssize_t n = PyBytes_GET_SIZE(bytes);
  auto *buf = static_cast<uint8_t *>(std::malloc(n ? n : 1));
  std::memcpy(buf, PyBytes_AS_STRING(bytes), n);
  *out = buf;
  *out_len = static_cast<int32_t>(n);
  return true;
}

PyObject *call(const char *fn, PyObject *args) {
  PyObject *mod = api();
  if (mod == nullptr) return nullptr;
  PyObject *f = PyObject_GetAttrString(mod, fn);
  if (f == nullptr) return nullptr;
  PyObject *res = PyObject_CallObject(f, args);
  Py_DECREF(f);
  return res;
}

}  // namespace

extern "C" {

// -------------------------------------------------------------------------
// lifecycle (lib.rs:29-34)
// -------------------------------------------------------------------------

bool init() {
  ensure_python();
  Gil gil;
  PyObject *res = call("init", nullptr);
  if (res == nullptr) return fail();
  Py_DECREF(res);
  return true;
}

void free_vec(uint8_t *ptr, int32_t /*len*/) { std::free(ptr); }

// Opaque handles are PyObject* (PrivateKey / PublicKey / Signature).
void destroy_private_key(void *ptr) {
  if (!ptr) return;
  Gil gil;
  Py_DECREF(static_cast<PyObject *>(ptr));
}
void destroy_public_key(void *ptr) { destroy_private_key(ptr); }
void destroy_signature(void *ptr) { destroy_private_key(ptr); }

// -------------------------------------------------------------------------
// serialization.rs surface (byte <-> opaque-handle conversions)
// -------------------------------------------------------------------------

static bool deserialize_obj(const char *fn, const uint8_t *in, int32_t in_len,
                            void **out) {
  ensure_python();
  Gil gil;
  PyObject *args = Py_BuildValue("(y#)", in, (Py_ssize_t)in_len);
  PyObject *res = call(fn, args);
  Py_DECREF(args);
  if (res == nullptr) return fail();
  *out = res;  // ownership to caller (destroy_* decrefs)
  return true;
}

static bool serialize_obj(const char *fn, const void *obj, uint8_t **out,
                          int32_t *out_len) {
  ensure_python();
  Gil gil;
  PyObject *args = Py_BuildValue("(O)", static_cast<const PyObject *>(obj));
  PyObject *res = call(fn, args);
  Py_DECREF(args);
  if (res == nullptr) return fail();
  bool ok = emit_bytes(res, out, out_len);
  Py_DECREF(res);
  return ok;
}

bool deserialize_private_key(const uint8_t *in, int32_t in_len, void **out) {
  return deserialize_obj("deserialize_private_key", in, in_len, out);
}
bool serialize_private_key(const void *sk, uint8_t **out, int32_t *out_len) {
  return serialize_obj("serialize_private_key", sk, out, out_len);
}
bool deserialize_public_key(const uint8_t *in, int32_t in_len, void **out) {
  return deserialize_obj("deserialize_public_key", in, in_len, out);
}
bool deserialize_public_key_cached(const uint8_t *in, int32_t in_len,
                                   void **out) {
  return deserialize_obj("deserialize_public_key_cached", in, in_len, out);
}
bool serialize_public_key(const void *pk, uint8_t **out, int32_t *out_len) {
  return serialize_obj("serialize_public_key", pk, out, out_len);
}
bool deserialize_signature(const uint8_t *in, int32_t in_len, void **out) {
  return deserialize_obj("deserialize_signature", in, in_len, out);
}
bool serialize_signature(const void *sig, uint8_t **out, int32_t *out_len) {
  return serialize_obj("serialize_signature", sig, out, out_len);
}

// -------------------------------------------------------------------------
// signatures.rs surface (core subset; byte-level API)
// -------------------------------------------------------------------------

bool private_key_to_public_key(const uint8_t *sk, int32_t sk_len,
                               uint8_t **out, int32_t *out_len) {
  ensure_python();
  Gil gil;
  PyObject *args = Py_BuildValue("(y#)", sk, (Py_ssize_t)sk_len);
  PyObject *res = call("private_key_to_public_key", args);
  Py_DECREF(args);
  if (res == nullptr) return fail();
  bool ok = emit_bytes(res, out, out_len);
  Py_DECREF(res);
  return ok;
}

bool sign_message(const uint8_t *sk, int32_t sk_len, const uint8_t *msg,
                  int32_t msg_len, const uint8_t *extra, int32_t extra_len,
                  bool composite, bool cip22, uint8_t **out,
                  int32_t *out_len) {
  ensure_python();
  Gil gil;
  PyObject *args =
      Py_BuildValue("(y#y#y#OO)", sk, (Py_ssize_t)sk_len, msg,
                    (Py_ssize_t)msg_len, extra, (Py_ssize_t)extra_len,
                    composite ? Py_True : Py_False, cip22 ? Py_True : Py_False);
  PyObject *res = call("sign_message", args);
  Py_DECREF(args);
  if (res == nullptr) return fail();
  bool ok = emit_bytes(res, out, out_len);
  Py_DECREF(res);
  return ok;
}

bool sign_pop(const uint8_t *sk, int32_t sk_len, const uint8_t *msg,
              int32_t msg_len, uint8_t **out, int32_t *out_len) {
  ensure_python();
  Gil gil;
  PyObject *args = Py_BuildValue("(y#y#)", sk, (Py_ssize_t)sk_len, msg,
                                 (Py_ssize_t)msg_len);
  PyObject *res = call("sign_pop", args);
  Py_DECREF(args);
  if (res == nullptr) return fail();
  bool ok = emit_bytes(res, out, out_len);
  Py_DECREF(res);
  return ok;
}

bool verify_signature(const uint8_t *pk, int32_t pk_len, const uint8_t *msg,
                      int32_t msg_len, const uint8_t *extra,
                      int32_t extra_len, const uint8_t *sig, int32_t sig_len,
                      bool composite, bool cip22) {
  ensure_python();
  Gil gil;
  PyObject *args = Py_BuildValue(
      "(y#y#y#y#OO)", pk, (Py_ssize_t)pk_len, msg, (Py_ssize_t)msg_len, extra,
      (Py_ssize_t)extra_len, sig, (Py_ssize_t)sig_len,
      composite ? Py_True : Py_False, cip22 ? Py_True : Py_False);
  PyObject *res = call("verify_signature", args);
  Py_DECREF(args);
  if (res == nullptr) return fail();
  bool ok = PyObject_IsTrue(res) == 1;
  Py_DECREF(res);
  return ok;
}

bool verify_pop(const uint8_t *pk, int32_t pk_len, const uint8_t *msg,
                int32_t msg_len, const uint8_t *sig, int32_t sig_len,
                bool composite, bool cip22) {
  ensure_python();
  Gil gil;
  PyObject *args = Py_BuildValue(
      "(y#y#y#OO)", pk, (Py_ssize_t)pk_len, msg, (Py_ssize_t)msg_len, sig,
      (Py_ssize_t)sig_len, composite ? Py_True : Py_False,
      cip22 ? Py_True : Py_False);
  PyObject *res = call("verify_pop", args);
  Py_DECREF(args);
  if (res == nullptr) return fail();
  bool ok = PyObject_IsTrue(res) == 1;
  Py_DECREF(res);
  return ok;
}

bool aggregate_public_keys(const uint8_t *const *pks, const int32_t *pk_lens,
                           int32_t num, uint8_t **out, int32_t *out_len) {
  ensure_python();
  Gil gil;
  PyObject *list = PyList_New(num);
  for (int32_t i = 0; i < num; i++) {
    PyList_SET_ITEM(list, i,
                    PyBytes_FromStringAndSize(
                        reinterpret_cast<const char *>(pks[i]), pk_lens[i]));
  }
  PyObject *args = Py_BuildValue("(O)", list);
  Py_DECREF(list);
  PyObject *res = call("aggregate_public_keys", args);
  Py_DECREF(args);
  if (res == nullptr) return fail();
  bool ok = emit_bytes(res, out, out_len);
  Py_DECREF(res);
  return ok;
}

bool aggregate_signatures(const uint8_t *const *sigs, const int32_t *sig_lens,
                          int32_t num, uint8_t **out, int32_t *out_len) {
  ensure_python();
  Gil gil;
  PyObject *list = PyList_New(num);
  for (int32_t i = 0; i < num; i++) {
    PyList_SET_ITEM(list, i,
                    PyBytes_FromStringAndSize(
                        reinterpret_cast<const char *>(sigs[i]), sig_lens[i]));
  }
  PyObject *args = Py_BuildValue("(O)", list);
  Py_DECREF(list);
  PyObject *res = call("aggregate_signatures", args);
  Py_DECREF(args);
  if (res == nullptr) return fail();
  bool ok = emit_bytes(res, out, out_len);
  Py_DECREF(res);
  return ok;
}

// -------------------------------------------------------------------------
// snark/mod.rs surface
// -------------------------------------------------------------------------

// repr(C) mirror of EpochBlockFFI (snark/epoch_block.rs:109-127)
struct EpochBlockFFI {
  uint16_t index;
  uint8_t round;
  const uint8_t *epoch_entropy;   // 16 bytes or null
  const uint8_t *parent_entropy;  // 16 bytes or null
  uint32_t maximum_non_signers;
  uint32_t pubkeys_num;
  uint32_t maximum_validators;
  const uint8_t *pubkeys;  // pubkeys_num * 96 bytes (compressed G2)
};

static PyObject *epoch_block_to_py(const EpochBlockFFI *e) {
  PyObject *mod = PyImport_ImportModule("celo_bls_snark_tpu.ffi.c_abi_support");
  if (mod == nullptr) return nullptr;
  PyObject *fn = PyObject_GetAttrString(mod, "make_epoch_block");
  Py_DECREF(mod);
  if (fn == nullptr) return nullptr;
  PyObject *epoch_entropy =
      e->epoch_entropy
          ? PyBytes_FromStringAndSize(
                reinterpret_cast<const char *>(e->epoch_entropy), 16)
          : (Py_INCREF(Py_None), Py_None);
  PyObject *parent_entropy =
      e->parent_entropy
          ? PyBytes_FromStringAndSize(
                reinterpret_cast<const char *>(e->parent_entropy), 16)
          : (Py_INCREF(Py_None), Py_None);
  PyObject *pubkeys = PyBytes_FromStringAndSize(
      reinterpret_cast<const char *>(e->pubkeys),
      (Py_ssize_t)e->pubkeys_num * 96);
  PyObject *args = Py_BuildValue("(HBOOIIO)", e->index, e->round,
                                 epoch_entropy, parent_entropy,
                                 e->maximum_non_signers, e->maximum_validators,
                                 pubkeys);
  Py_DECREF(epoch_entropy);
  Py_DECREF(parent_entropy);
  Py_DECREF(pubkeys);
  PyObject *res = PyObject_CallObject(fn, args);
  Py_DECREF(fn);
  Py_DECREF(args);
  return res;
}

bool verify(const uint8_t *vk, uint32_t vk_len, const uint8_t *proof,
            uint32_t proof_len, EpochBlockFFI first_epoch,
            EpochBlockFFI last_epoch) {
  ensure_python();
  Gil gil;
  PyObject *first = epoch_block_to_py(&first_epoch);
  PyObject *last = epoch_block_to_py(&last_epoch);
  if (first == nullptr || last == nullptr) {
    Py_XDECREF(first);
    Py_XDECREF(last);
    return fail();
  }
  PyObject *args = Py_BuildValue("(y#y#OO)", vk, (Py_ssize_t)vk_len, proof,
                                 (Py_ssize_t)proof_len, first, last);
  Py_DECREF(first);
  Py_DECREF(last);
  PyObject *res = call("verify", args);
  Py_DECREF(args);
  if (res == nullptr) return fail();
  bool ok = PyObject_IsTrue(res) == 1;
  Py_DECREF(res);
  return ok;
}

bool encode_epoch_block_to_bytes_cip22(EpochBlockFFI epoch, uint8_t **out,
                                       int32_t *out_len) {
  ensure_python();
  Gil gil;
  PyObject *block = epoch_block_to_py(&epoch);
  if (block == nullptr) return fail();
  PyObject *args = Py_BuildValue("(O)", block);
  Py_DECREF(block);
  PyObject *res = call("encode_epoch_block_to_bytes_cip22", args);
  Py_DECREF(args);
  if (res == nullptr) return fail();
  // returns (inner_bytes, extra_bytes); emit inner (mirrors the reference's
  // encode_epoch_block_to_bytes_cip22 output)
  PyObject *inner =
      PyTuple_Check(res) ? PyTuple_GetItem(res, 0) : res;
  bool ok = emit_bytes(inner, out, out_len);
  Py_DECREF(res);
  return ok;
}

}  // extern "C"
