/* Minimal HDF5 1.10 declarations shim, linked against the system's
 * /lib/x86_64-linux-gnu/libhdf5_serial.so.103 (HDF5 1.10.8; the image
 * ships the runtime library but no headers).  Covers exactly the API
 * surface PINC uses (serial; the two H5Pset_*_mpio parallel setters are
 * no-op stubs in hdf5_mpio_stub.c).  Types/constants follow the public
 * 1.10 ABI: hid_t is int64, the version-mapped macros resolve to the
 * *2 functions, property-class / native-type "constants" are globals
 * behind an H5open() comma expression. */
#ifndef PINC_SHIM_HDF5_H
#define PINC_SHIM_HDF5_H

#include <stddef.h>
#include <stdint.h>
#include <sys/types.h>    /* ssize_t */

#include <mpi.h>          /* our serial shim (for the mpio stubs) */

typedef int64_t hid_t;
typedef int herr_t;
typedef int htri_t;
typedef unsigned long long hsize_t;
typedef long long hssize_t;

/* ---- library control ---- */
herr_t H5open(void);
herr_t H5get_libversion(unsigned *maj, unsigned *min, unsigned *rel);

/* ---- file ---- */
#define H5F_ACC_RDONLY 0x0000u
#define H5F_ACC_RDWR   0x0001u
#define H5F_ACC_TRUNC  0x0002u
#define H5F_ACC_EXCL   0x0004u

hid_t H5Fcreate(const char *name, unsigned flags, hid_t fcpl, hid_t fapl);
hid_t H5Fopen(const char *name, unsigned flags, hid_t fapl);
herr_t H5Fclose(hid_t f);
ssize_t H5Fget_name(hid_t obj, char *name, size_t size);

/* ---- property lists ---- */
#define H5P_DEFAULT ((hid_t)0)

extern hid_t H5P_CLS_FILE_ACCESS_ID_g;
extern hid_t H5P_CLS_DATASET_XFER_ID_g;
extern hid_t H5P_CLS_DATASET_CREATE_ID_g;
#define H5P_FILE_ACCESS    (H5open(), H5P_CLS_FILE_ACCESS_ID_g)
#define H5P_DATASET_XFER   (H5open(), H5P_CLS_DATASET_XFER_ID_g)
#define H5P_DATASET_CREATE (H5open(), H5P_CLS_DATASET_CREATE_ID_g)

hid_t H5Pcreate(hid_t cls);
herr_t H5Pclose(hid_t plist);
herr_t H5Pset_chunk(hid_t plist, int ndims, const hsize_t *dims);

/* parallel-HDF5 setters: no-op stubs (hdf5_mpio_stub.c) */
typedef enum { H5FD_MPIO_INDEPENDENT = 0, H5FD_MPIO_COLLECTIVE } H5FD_mpio_xfer_t;
herr_t H5Pset_fapl_mpio(hid_t fapl, MPI_Comm comm, MPI_Info info);
herr_t H5Pset_dxpl_mpio(hid_t dxpl, H5FD_mpio_xfer_t mode);

/* ---- datatypes ---- */
extern hid_t H5T_NATIVE_DOUBLE_g;
extern hid_t H5T_IEEE_F64LE_g;
#define H5T_NATIVE_DOUBLE (H5open(), H5T_NATIVE_DOUBLE_g)
#define H5T_IEEE_F64LE    (H5open(), H5T_IEEE_F64LE_g)

/* ---- dataspace ---- */
#define H5S_ALL ((hid_t)0)
#define H5S_UNLIMITED ((hsize_t)(hssize_t)(-1))

typedef enum {
    H5S_SELECT_NOOP = -1,
    H5S_SELECT_SET = 0,
    H5S_SELECT_OR,
    H5S_SELECT_AND,
    H5S_SELECT_XOR,
    H5S_SELECT_NOTB,
    H5S_SELECT_NOTA,
    H5S_SELECT_APPEND,
    H5S_SELECT_PREPEND,
    H5S_SELECT_INVALID
} H5S_seloper_t;

hid_t H5Screate_simple(int rank, const hsize_t *dims, const hsize_t *maxdims);
herr_t H5Sclose(hid_t space);
herr_t H5Sselect_hyperslab(hid_t space, H5S_seloper_t op,
                           const hsize_t *start, const hsize_t *stride,
                           const hsize_t *count, const hsize_t *block);
int H5Sget_simple_extent_dims(hid_t space, hsize_t *dims, hsize_t *maxdims);

/* ---- groups / links ---- */
hid_t H5Gcreate2(hid_t loc, const char *name, hid_t lcpl, hid_t gcpl,
                 hid_t gapl);
#define H5Gcreate H5Gcreate2
herr_t H5Gclose(hid_t g);
htri_t H5Lexists(hid_t loc, const char *name, hid_t lapl);

/* ---- datasets ---- */
hid_t H5Dcreate2(hid_t loc, const char *name, hid_t type, hid_t space,
                 hid_t lcpl, hid_t dcpl, hid_t dapl);
#define H5Dcreate H5Dcreate2
hid_t H5Dopen2(hid_t loc, const char *name, hid_t dapl);
#define H5Dopen H5Dopen2
herr_t H5Dclose(hid_t d);
hid_t H5Dget_space(hid_t d);
herr_t H5Dset_extent(hid_t d, const hsize_t *size);
herr_t H5Dwrite(hid_t d, hid_t memtype, hid_t memspace, hid_t filespace,
                hid_t plist, const void *buf);
herr_t H5Dread(hid_t d, hid_t memtype, hid_t memspace, hid_t filespace,
               hid_t plist, void *buf);

/* ---- attributes ---- */
hid_t H5Acreate2(hid_t loc, const char *name, hid_t type, hid_t space,
                 hid_t acpl, hid_t aapl);
#define H5Acreate H5Acreate2
herr_t H5Awrite(hid_t attr, hid_t type, const void *buf);
herr_t H5Aclose(hid_t attr);
htri_t H5Aexists(hid_t obj, const char *name);
herr_t H5Adelete(hid_t loc, const char *name);

#endif
