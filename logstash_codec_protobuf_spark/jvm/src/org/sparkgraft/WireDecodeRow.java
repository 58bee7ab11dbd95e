package org.sparkgraft;

import java.util.ArrayList;
import java.util.Base64;
import java.util.List;
import java.util.concurrent.ConcurrentHashMap;

import org.apache.spark.sql.Row;
import org.apache.spark.sql.RowFactory;
import org.apache.spark.sql.api.java.UDF2;
import org.sparkproject.connect.protobuf.ByteString;
import org.sparkproject.connect.protobuf.DescriptorProtos;
import org.sparkproject.connect.protobuf.Descriptors;
import org.sparkproject.connect.protobuf.DynamicMessage;

/**
 * JVM-side protobuf wire decode straight to a Catalyst struct row — the
 * fast variant of {@link WireDecodeJson} (no JSON print, no from_json
 * re-parse): payload bytes -> DynamicMessage -> Row, zero Python workers
 * and zero Arrow exchange anywhere in the plan.
 *
 * Row layout (must match the StructType the Python side registers):
 * the message's fields in DECLARED order, then one string slot per oneof
 * carrying the name of the member set on the wire (null when none).
 *
 * Presence contract (parity with the engine's Arrow decoder,
 * operators/pb_wire.py decode plan): fields WITH presence (oneof members)
 * are null unless set; no-presence proto3 scalars emit their defaults
 * (getField returns them). Dialects differ only in enums: pb3 -> NAME
 * (String), pb2 -> code (Long, protobuf.rb:134-136).
 *
 * Scope: flat scalar messages (the hot turn_wire path). The Python caller
 * refuses repeated/message/map fields up front and routes those to the
 * Arrow decoder; {@link #call} returns null (-> dead-letter row) on any
 * parse failure.
 */
public class WireDecodeRow implements UDF2<byte[], String, Row> {

    private static final ConcurrentHashMap<String, Entry> CACHE =
        new ConcurrentHashMap<>();

    private static final class Entry {
        final Descriptors.Descriptor descriptor;
        final Descriptors.FieldDescriptor[] fields;
        final Descriptors.OneofDescriptor[] oneofs;
        final boolean pb2;

        Entry(Descriptors.Descriptor descriptor, boolean pb2) {
            this.descriptor = descriptor;
            List<Descriptors.FieldDescriptor> fs = descriptor.getFields();
            this.fields = fs.toArray(new Descriptors.FieldDescriptor[0]);
            this.oneofs = descriptor.getOneofs()
                .toArray(new Descriptors.OneofDescriptor[0]);
            this.pb2 = pb2;
        }
    }

    private static Entry load(String cfg) {
        try {
            String[] parts = cfg.split("\\|", -1);
            byte[] setBytes = Base64.getDecoder().decode(parts[0]);
            DescriptorProtos.FileDescriptorSet set =
                DescriptorProtos.FileDescriptorSet.parseFrom(setBytes);
            List<Descriptors.FileDescriptor> files = new ArrayList<>();
            for (DescriptorProtos.FileDescriptorProto fdp : set.getFileList()) {
                files.add(Descriptors.FileDescriptor.buildFrom(
                    fdp, files.toArray(new Descriptors.FileDescriptor[0])));
            }
            String want = parts[1];
            Descriptors.Descriptor descriptor = null;
            for (Descriptors.FileDescriptor fd : files) {
                for (Descriptors.Descriptor d : fd.getMessageTypes()) {
                    if (d.getFullName().equals(want)) {
                        descriptor = d;
                    }
                }
            }
            if (descriptor == null) {
                throw new IllegalArgumentException(
                    "message not in descriptor set: " + want);
            }
            boolean pb2 = parts.length > 2 && "pb2".equals(parts[2]);
            return new Entry(descriptor, pb2);
        } catch (Exception e) {
            throw new IllegalArgumentException(
                "bad wire-decode config: " + e, e);
        }
    }

    private static Object convert(Object v,
                                  Descriptors.FieldDescriptor fd,
                                  boolean pb2) {
        switch (fd.getJavaType()) {
            case ENUM:
                Descriptors.EnumValueDescriptor ev =
                    (Descriptors.EnumValueDescriptor) v;
                if (pb2) {
                    return (long) ev.getNumber();
                }
                // open-enum unrecognized code: DynamicMessage hands back a
                // synthetic descriptor (index -1, UNKNOWN_ENUM_VALUE_* name)
                // — the engine contract decodes it as the DECIMAL STRING of
                // the int32 code, matching the Arrow decoder's passthrough
                // and JsonFormat's number print in the jvm_json foil
                return ev.getIndex() == -1
                    ? String.valueOf(ev.getNumber())
                    : (Object) ev.getName();
            case BYTE_STRING:
                return ((ByteString) v).toByteArray();
            default:
                return v;  // Integer / Long / Float / Double / Boolean / String
        }
    }

    @Override
    public Row call(byte[] payload, String cfg) {
        if (payload == null || cfg == null) {
            return null;
        }
        Entry entry = CACHE.computeIfAbsent(cfg, WireDecodeRow::load);
        DynamicMessage message;
        try {
            message = DynamicMessage.parseFrom(entry.descriptor, payload);
        } catch (Exception e) {
            return null;  // dead-letter: caller substitutes the error struct
        }
        Object[] out = new Object[entry.fields.length + entry.oneofs.length];
        for (int i = 0; i < entry.fields.length; i++) {
            Descriptors.FieldDescriptor fd = entry.fields[i];
            if (fd.hasPresence() && !message.hasField(fd)) {
                out[i] = null;
            } else {
                out[i] = convert(message.getField(fd), fd, entry.pb2);
            }
        }
        for (int j = 0; j < entry.oneofs.length; j++) {
            Descriptors.FieldDescriptor set =
                message.getOneofFieldDescriptor(entry.oneofs[j]);
            out[entry.fields.length + j] = set == null ? null : set.getName();
        }
        return RowFactory.create(out);
    }
}
